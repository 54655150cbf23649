"""Transformation operators.

Each operator is a pure function ``DataFrame -> DataFrame`` plus a thin
``Transformer`` adapter carrying config validation, registered in
``TRANSFORMER_REGISTRY`` by type string — preserving the reference's
extension contract (``pipeline/TransformerRegistry.scala:13-19``,
user registration at ``pipeline/ExtractorRegistry.scala:40-42``) without
the ceremony.
"""

from etl_spark_gradle_spark.operators.dedup import (  # noqa: F401
    ContaminationTransformer,
    DedupTransformer,
)
from etl_spark_gradle_spark.operators.corpus import (  # noqa: F401
    BalanceClassesTransformer,
    CapPerGroupTransformer,
    ChunkTransformer,
    DecontaminateTransformer,
    HashSampleTransformer,
    MixTransformer,
    NegativeSampleTransformer,
    PackTransformer,
    TokenFrequencyTransformer,
    WeightedSampleTransformer,
    balance_classes,
    cap_per_group,
    chunk_documents,
    decontaminate,
    hash_sample,
    mix_to_target,
    negative_sample,
    pack_sequences,
    token_frequency,
    weighted_sample,
)
from etl_spark_gradle_spark.operators.bloom import (  # noqa: F401
    BloomSemiJoinTransformer,
    bloom_filter_rows,
    bloom_semi_join,
    build_bloom,
)
from etl_spark_gradle_spark.operators.keywords import (  # noqa: F401
    AhoCorasick,
    KeywordTagTransformer,
    keyword_matches,
)
from etl_spark_gradle_spark.operators.collocations import (  # noqa: F401
    PmiTransformer,
    pmi_bigrams,
)
from etl_spark_gradle_spark.operators.bpe import (  # noqa: F401
    BpeTokenizeTransformer,
    bpe_tokenize,
    train_bpe,
)
from etl_spark_gradle_spark.operators.delta import (  # noqa: F401
    ConsolidateTransformer,
    DiffTransformer,
    Scd2LookupTransformer,
    Scd2Transformer,
    apply_changes,
    consolidate,
    row_fingerprint,
    scd2_lookup,
    table_diff,
)
from etl_spark_gradle_spark.operators.layout import (  # noqa: F401
    ZorderTransformer,
    z_value,
    zorder,
)
from etl_spark_gradle_spark.operators.lm import (  # noqa: F401
    LmScoreTransformer,
    score_with_bigram_lm,
    train_bigram_lm,
)
from etl_spark_gradle_spark.operators.multimodal import (  # noqa: F401
    MultimodalTransformer,
    decode_audio,
    decode_images,
    with_media_metadata,
)
from etl_spark_gradle_spark.operators.pii import (  # noqa: F401
    KAnonymityTransformer,
    LDiversityTransformer,
    TClosenessTransformer,
    l_diversity,
    PiiTransformer,
    k_anonymity,
    t_closeness,
)
from etl_spark_gradle_spark.operators.relational import (  # noqa: F401
    AggregationTransformer,
    AnalyticsTransformer,
    AsofJoinTransformer,
    DistinctTransformer,
    ExplodeTransformer,
    UnpivotTransformer,
    FilterTransformer,
    FlattenTransformer,
    JoinTransformer,
    MapTransformer,
    PivotTransformer,
    QuantileFilterTransformer,
    RangeJoinTransformer,
    IntervalJoinTransformer,
    RankingTransformer,
    RollingTimeTransformer,
    SaltedAggregationTransformer,
    SampleTransformer,
    SetOpTransformer,
    SortTransformer,
    SplitTransformer,
    SqlTransformer,
    WindowingTransformer,
    aggregate,
    analytic_columns,
    asof_join,
    distinct_rows,
    explode_column,
    filter_rows,
    flatten_structs,
    hash_split,
    join_view,
    map_columns,
    pivot_table,
    quantile_filter,
    interval_overlap_join,
    range_join_points,
    rank_rows,
    salted_aggregate,
    sample_rows,
    set_op,
    sort_limit,
    sql_transform,
    window_aggregate,
)
from etl_spark_gradle_spark.operators.events import (  # noqa: F401
    CohortTransformer,
    DebounceTransformer,
    RollingActiveTransformer,
    SessionizeTransformer,
    TopPathsTransformer,
    FunnelTransformer,
    MarketBasketTransformer,
    TransitionsTransformer,
    association_rules,
    debounce,
    sessionize,
)
from etl_spark_gradle_spark.operators.graph import (  # noqa: F401
    BfsDistancesTransformer,
    PagerankTransformer,
    TriangleCountTransformer,
    bfs_distances,
    pagerank,
    triangle_count,
)
from etl_spark_gradle_spark.operators.clustering import (  # noqa: F401
    KMeansTransformer,
    kmeans,
    semantic_representatives,
)
from etl_spark_gradle_spark.operators.skew import (  # noqa: F401
    SkewJoinTransformer,
    SkewReportTransformer,
    skew_join,
    skew_report,
)
from etl_spark_gradle_spark.operators.features import (  # noqa: F401
    FeatureHashTransformer,
    OneHotTransformer,
    RobustScaleTransformer,
    TargetEncodeTransformer,
    feature_hash,
    one_hot,
    robust_scale,
    target_encode,
)
from etl_spark_gradle_spark.operators.retrieval import Bm25Transformer  # noqa: F401
from etl_spark_gradle_spark.operators.evaluation import (  # noqa: F401
    EvaluationTransformer,
    auc,
    classification_report,
    cohens_kappa,
    lift_table,
)
from etl_spark_gradle_spark.operators.stats import (  # noqa: F401
    DiscretizeTransformer,
    DriftTransformer,
    QuantileNormalizeTransformer,
    StatsTransformer,
    category_drift,
    discretize,
    exact_quantiles,
    ks_drift,
    mad_outliers,
)
from etl_spark_gradle_spark.operators.strings import EditJoinTransformer  # noqa: F401
from etl_spark_gradle_spark.operators.sketch import SketchTransformer  # noqa: F401
from etl_spark_gradle_spark.operators.timeseries import (  # noqa: F401
    AcfTransformer,
    CusumTransformer,
    IntervalsTransformer,
    LagFeaturesTransformer,
    OhlcTransformer,
    ResampleTransformer,
    RollingMedianTransformer,
    RollingZscoreTransformer,
    TimeRollupTransformer,
    TwapTransformer,
    acf,
    cusum_changepoints,
    lag_features,
    merge_intervals,
    ohlc_bars,
    resample,
    rolling_zscore,
    twap,
    time_rollup,
)
from etl_spark_gradle_spark.operators.infotheory import (  # noqa: F401
    InfoTheoryTransformer,
    category_entropy,
    js_divergence,
    kl_divergence,
    mutual_information,
    psi_drift,
)
from etl_spark_gradle_spark.quality import (  # noqa: F401
    ExpectTransformer,
    ProfileTransformer,
    SchemaAlignTransformer,
    profile_columns,
)
from etl_spark_gradle_spark.operators.text import (  # noqa: F401
    ModelScoreTransformer,
    TextAnalysisTransformer,
)

TRANSFORMER_REGISTRY = {
    "filter": FilterTransformer(),
    "map": MapTransformer(),
    "aggregation": AggregationTransformer(),
    "join": JoinTransformer(),
    "windowing": WindowingTransformer(),
    "sql": SqlTransformer(),
    # beyond-reference (SURVEY §2.6 / §2.7 extensions)
    "ranking": RankingTransformer(),
    "analytics": AnalyticsTransformer(),
    "rolling_time": RollingTimeTransformer(),
    "pivot": PivotTransformer(),
    "asof_join": AsofJoinTransformer(),
    "range_join": RangeJoinTransformer(),
    "interval_join": IntervalJoinTransformer(),
    "setop": SetOpTransformer(),
    "sort": SortTransformer(),
    "distinct": DistinctTransformer(),
    "explode": ExplodeTransformer(),
    "unpivot": UnpivotTransformer(),
    "sample": SampleTransformer(),
    "split": SplitTransformer(),
    "salted_aggregation": SaltedAggregationTransformer(),
    "diff": DiffTransformer(),
    "scd2": Scd2Transformer(),
    "consolidate": ConsolidateTransformer(),
    "scd2_lookup": Scd2LookupTransformer(),
    "quantile_filter": QuantileFilterTransformer(),
    "flatten": FlattenTransformer(),
    "zorder": ZorderTransformer(),
    "schema_align": SchemaAlignTransformer(),
    "expect": ExpectTransformer(),
    "sketch": SketchTransformer(),
    "bm25": Bm25Transformer(),
    "funnel": FunnelTransformer(),
    "cohort": CohortTransformer(),
    "transitions": TransitionsTransformer(),
    "top_paths": TopPathsTransformer(),
    "rolling_active": RollingActiveTransformer(),
    "market_basket": MarketBasketTransformer(),
    "sessionize": SessionizeTransformer(),
    "debounce": DebounceTransformer(),
    "edit_join": EditJoinTransformer(),
    "evaluation": EvaluationTransformer(),
    "quantile_normalize": QuantileNormalizeTransformer(),
    "stats": StatsTransformer(),
    "resample": ResampleTransformer(),
    "rolling_median": RollingMedianTransformer(),
    "time_rollup": TimeRollupTransformer(),
    "infotheory": InfoTheoryTransformer(),
    "intervals": IntervalsTransformer(),
    "changepoint": CusumTransformer(),
    "acf": AcfTransformer(),
    "ohlc": OhlcTransformer(),
    "twap": TwapTransformer(),
    "lag_features": LagFeaturesTransformer(),
    "rolling_zscore": RollingZscoreTransformer(),
    "profile": ProfileTransformer(),
    "drift": DriftTransformer(),
    "pmi": PmiTransformer(),
    "weighted_sample": WeightedSampleTransformer(),
    "pagerank": PagerankTransformer(),
    "triangle_count": TriangleCountTransformer(),
    "kmeans": KMeansTransformer(),
    "bfs": BfsDistancesTransformer(),
    "skew_join": SkewJoinTransformer(),
    "skew_report": SkewReportTransformer(),
    "bloom_semi_join": BloomSemiJoinTransformer(),
    "keyword_tag": KeywordTagTransformer(),
    "discretize": DiscretizeTransformer(),
    "target_encode": TargetEncodeTransformer(),
    "one_hot": OneHotTransformer(),
    "robust_scale": RobustScaleTransformer(),
    "feature_hash": FeatureHashTransformer(),
    # LLM-data-pipeline operators (SURVEY §7.2 step 8)
    "dedup": DedupTransformer(),
    "contamination": ContaminationTransformer(),
    "text_analysis": TextAnalysisTransformer(),
    "model_score": ModelScoreTransformer(),
    "lm_score": LmScoreTransformer(),
    "pii": PiiTransformer(),
    "k_anonymity": KAnonymityTransformer(),
    "l_diversity": LDiversityTransformer(),
    "t_closeness": TClosenessTransformer(),
    "chunk": ChunkTransformer(),
    "bpe_tokenize": BpeTokenizeTransformer(),
    "pack": PackTransformer(),
    "token_frequency": TokenFrequencyTransformer(),
    "hash_sample": HashSampleTransformer(),
    "negative_sample": NegativeSampleTransformer(),
    "decontaminate": DecontaminateTransformer(),
    "mix": MixTransformer(),
    "cap_per_group": CapPerGroupTransformer(),
    "balance_classes": BalanceClassesTransformer(),
    "multimodal": MultimodalTransformer(),
}


def register_transformer(type_key: str, transformer) -> None:
    """User extension point (parity: ``pipeline/TransformerRegistry.scala:40-42``)."""
    TRANSFORMER_REGISTRY[type_key.lower()] = transformer
