"""documents -> synthetic RICH articles exercising the kernel's
JSON-LD date path, whole-element ``<br>`` rewrap, and srcset image
extraction through a NON-generic rule (``rules/synthetic_rich.py``,
tool key ``rich``).

Everything is closed-form in (doc_id, text) so the ``extract_rich``
query has an exact DuckDB oracle; if the kernel's LD/rewrap/srcset
behavior drifts, the oracle hash breaks. Spark-side the template is a
pure column expression (JVM concat, no Python)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .doc_html import author_col, pubdate_iso_col, title_col

IMG_BASE = "https://img.example/rich"


def rich_title_col(doc_id: Column) -> Column:
    return F.concat(F.lit("Rich "), doc_id.cast("string"))


def doc_to_rich_html(doc_id: Column, text: Column) -> Column:
    ld = F.concat(
        F.lit('{"@context":"http://schema.org","@type":"NewsArticle","headline":"'),
        rich_title_col(doc_id),
        F.lit('","author":[{"@type":"Person","name":"'),
        author_col(doc_id),
        F.lit('"}],"datePublished":"'),
        pubdate_iso_col(doc_id),
        F.lit('"}'),
    )
    img = F.concat(
        F.lit(f"<figure><img src='{IMG_BASE}/"),
        doc_id.cast("string"),
        F.lit(f"-small.jpg' srcset='{IMG_BASE}/"),
        doc_id.cast("string"),
        F.lit(f"-small.jpg 400w, {IMG_BASE}/"),
        doc_id.cast("string"),
        F.lit("-large.jpg 800w'><figcaption>Caption "),
        doc_id.cast("string"),
        F.lit("</figcaption></figure>"),
    )
    return F.concat(
        F.lit("<!DOCTYPE html><html lang='en'><head><title>"),
        title_col(doc_id),
        F.lit("</title><script type='application/ld+json'>"),
        ld,
        F.lit("</script></head><body><main><div class='article-media'>"),
        img,
        F.lit("</div><div class='article-body'><p>"),
        text,
        F.lit("</p><div class='br-text'>Alpha "),
        doc_id.cast("string"),
        F.lit(".<br><br>Beta "),
        doc_id.cast("string"),
        F.lit(".</div></div></main></body></html>"),
    )


def documents_as_rich_transcripts(documents: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    return documents.select(
        F.col("source").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("tool").alias("role"),
        doc_to_rich_html(F.col("doc_id"), F.col("text")).alias("text"),
        F.lit("rich").alias("tool"),
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("ts"),
        F.col("doc_id"),
    )
