"""gocrd-spark: PySpark-native document-extraction engine.

Library surface (pure Python, no Spark needed):
    from gocrd_spark import Page, Mets, extract_document, extract_any_document

Pipeline surface:
    from gocrd_spark.pipeline import extract_pages, mets_files, run_extract_job
"""

from .extract import extract_any_document, extract_document, mets_records, sniff_kind
from .mets import FLocat, File, Match as MetsMatch, Mets
from .page import Line, Match as PageMatch, Page, Polygon, Rect, Region, Word

__all__ = [
    "Page", "Region", "Line", "Word", "Polygon", "Rect", "PageMatch",
    "Mets", "File", "FLocat", "MetsMatch",
    "extract_document", "extract_any_document", "mets_records", "sniff_kind",
]
