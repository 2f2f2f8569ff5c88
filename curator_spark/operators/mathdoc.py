"""MathExtractStage / MathContentExtractor, Spark-first (reference
``stages/math/download/extract.py:88-270``): decode fetched bytes,
route each document to notebook / html / text, and extract text —
notebooks through the JSON cell walk, HTML through the in-engine
``functions/html.py`` Column chain (the reference shells out to Lynx;
``html_extractor`` is the injectable seam for that renderer), plain
text passing through. Rows whose bytes cannot be decoded emit no row
(the reference's extractor returns None and the stage filters it).

Spark shape: ONE Arrow-batched pass over (bytes, url, mime) does the
python-only work (decode, magic sniff via the injectable
``magic_detector``, JSON notebook walk), then the HTML extraction runs
as regexp_replace Column chains — JVM codegen over exactly the rows
routed to 'html', no second Python hop. Bytes are projected away
before any shuffle."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["math_extract"]

MATH_EXTRACT_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("type", StringType(), False),
        StructField("magic_mime_type", StringType(), True),
        StructField("content", StringType(), False),
    ]
)


def math_extract(
    df: DataFrame,
    binary_col: str = "binary_content",
    url_col: str = "url",
    mime_col: str = "mime_type",
    magic_detector=None,
    encoding_detector=None,
    html_extractor=None,
) -> DataFrame:
    """Output columns (reference ``extract.py:126-127`` output_columns):
    ``text``, ``url``, ``type``, ``magic_mime_type``.

    Seams: ``magic_detector(bytes) -> mime | None`` (libmagic),
    ``encoding_detector(bytes) -> encoding | None`` (resiliparse),
    ``html_extractor(html_str) -> text`` (Lynx). All default to the
    model-free in-engine behavior: no magic (the routing handles magic
    None explicitly), utf-8-only decode, Column-chain HTML extraction."""
    from ..kernels.mathdoc import decode_content, determine_doc_type, notebook_to_text

    slim = df.select(
        F.col(binary_col).alias("_raw"),
        F.col(url_col).cast("string").alias("url"),
        F.col(mime_col).cast("string").alias("_mime"),
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for raw, url, mime in zip(pdf["_raw"], pdf["url"], pdf["_mime"]):
                magic_mime = None
                if magic_detector is not None and raw is not None:
                    try:
                        magic_mime = magic_detector(bytes(raw))
                    except Exception:  # noqa: BLE001 - reference logs + None
                        magic_mime = None
                content = decode_content(
                    raw if raw is not None else None,
                    encoding_detector=encoding_detector,
                )
                if not content:
                    continue  # undecodable -> dropped row (extract.py:150-152)
                mime = None if mime is None or (isinstance(mime, float) and pd.isna(mime)) else mime
                doc_type = determine_doc_type(content, magic_mime, mime, url)
                if doc_type == "notebook":
                    content = notebook_to_text(content)
                elif doc_type == "html" and html_extractor is not None:
                    content = html_extractor(content)
                rows.append((url, doc_type, magic_mime, content))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MATH_EXTRACT_SCHEMA.fields]
            )

    routed = slim.mapInPandas(run, schema=MATH_EXTRACT_SCHEMA)
    if html_extractor is not None:
        text = F.col("content")
    else:
        from ..functions.html import html_to_text

        text = F.when(
            F.col("type") == "html", html_to_text(F.col("content"))
        ).otherwise(F.col("content"))
    return routed.select(
        text.alias("text"), "url", "type", "magic_mime_type"
    )
