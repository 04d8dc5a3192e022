"""Operator library — SURVEY.md §2.B's prescribed operator surface as tested
PySpark building blocks (the ontology helper functions reborn as column
expressions; cf. reference ``web_app/ontologies/Sports_Data_Ontology.ttl``
:301-349, 426-489, 586-648 and ``bambooai/messages/default_prompts.yaml``).

Everything here is a pure column expression or DataFrame transform — no
Python UDFs — so plans stay inside whole-stage codegen.
"""

from bambooai_spark.functions.timeseries import (
    rolling_mean,
    rolling_mean_max,
    cumulative_sum,
    pct_change,
    elapsed_seconds,
    determine_segments,
    dense_reid_by_first_ts,
    sessionize,
    asof_join,
)
from bambooai_spark.functions.aggregates import (
    group_index,
    summary_stats,
    exact_corr,
    regr_slope_exact,
)
from bambooai_spark.functions.text import (
    tokens,
    word_shingles,
    char_ngrams,
    token_stats,
    quality_features,
    lang_scores,
    fingerprint,
)
from bambooai_spark.functions.vectors import dot, l2_norm, cosine

__all__ = [
    "rolling_mean",
    "rolling_mean_max",
    "cumulative_sum",
    "pct_change",
    "elapsed_seconds",
    "determine_segments",
    "dense_reid_by_first_ts",
    "sessionize",
    "asof_join",
    "group_index",
    "summary_stats",
    "exact_corr",
    "regr_slope_exact",
    "tokens",
    "word_shingles",
    "char_ngrams",
    "token_stats",
    "quality_features",
    "lang_scores",
    "fingerprint",
    "dot",
    "l2_norm",
    "cosine",
]
