from karanta_ocr_spark.sources.web_pages import (
    read_web_pages,
    synthetic_web_pages,
    web_pages_from_documents,
    WEB_PAGES_SCHEMA,
)

__all__ = [
    "read_web_pages", "synthetic_web_pages", "web_pages_from_documents",
    "WEB_PAGES_SCHEMA",
]
