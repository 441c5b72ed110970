from arxiv_crawler_spark.functions.urls import (  # noqa: F401
    canonicalize_url,
    host_of,
    normalize_arxiv_id_col,
    arxiv_id_to_url,
)
from arxiv_crawler_spark.functions.hashing import (  # noqa: F401
    url_hash,
    md5_hash64,
    murmur3_64_udf,
)
