from arxiv_crawler_spark.extraction.tei import (  # noqa: F401
    CITATION_STRUCT,
    EXTRACTED_SCHEMA,
    canonical_extraction_json,
    extract_citations,
    extract_pages,
)
