from namedis_spark.functions.core import (  # noqa: F401
    cslr_v2,
    weighted_jaccard,
    jaro_winkler,
    tfidf_cosine,
    year_range_diff,
    year_diff_discount,
    overestimate_ambig,
    coauthor_evidence_error,
    shared_coauthor_boost,
)
from namedis_spark.functions.text import (  # noqa: F401
    tokenize,
    lemma,
    normalize_name_key,
    STOPWORDS,
)
