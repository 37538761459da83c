from sparkcheck.textextract.extract import (
    EXTRACTOR_VERSION,
    extract_text_py,
    extract_text_udf,
    extraction_mismatch_rows,
)

__all__ = [
    "EXTRACTOR_VERSION",
    "extract_text_py",
    "extract_text_udf",
    "extraction_mismatch_rows",
]
