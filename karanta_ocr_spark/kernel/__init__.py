"""Pure-Python extraction kernel. No Spark, no third-party deps.

Every function here is deterministic: same bytes in → same text out,
regardless of process, thread, partition count, or machine. This is
what makes the Spark pipeline's output byte-identical per url to the
single-process golden run (the correctness contract of the engine).
"""

from karanta_ocr_spark.kernel.textnorm import fix_text, clean_element_text, cap_split_string
from karanta_ocr_spark.kernel.html_flatten import flatten_html
from karanta_ocr_spark.kernel.boilerplate import score_blocks, extract_main_text
from karanta_ocr_spark.kernel.pdf_mini import parse_pdf, PageReport, TextElement, ImageElement, BoundingBox
from karanta_ocr_spark.kernel.bbox_merge import merge_image_elements
from karanta_ocr_spark.kernel.linearize import linearize_page_report, page_natural_text
from karanta_ocr_spark.kernel.extract import extract_document, sniff_content_type
from karanta_ocr_spark.kernel.assemble import assemble_document

__all__ = [
    "fix_text", "clean_element_text", "cap_split_string",
    "flatten_html", "score_blocks", "extract_main_text",
    "parse_pdf", "PageReport", "TextElement", "ImageElement", "BoundingBox",
    "merge_image_elements", "linearize_page_report", "page_natural_text",
    "extract_document", "sniff_content_type", "assemble_document",
]
