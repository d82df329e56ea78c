"""Sources (SURVEY.md §2.1): the reference's reader classes re-expressed
as DataFrame scans returning the same logical records.

Every reader yields the reference's ``(k1, v1)`` shape as columns
``(filename, line)`` / ``(filename, text)`` so user map() code ports
directly. Progress tracking (TextFileReader.progress,
remap.py:34-36) is the Spark UI / status tracker — not re-implemented.

Scale: spark.read.text splits large files by
``spark.sql.files.maxPartitionBytes`` — the reference's 1-file-1-task
planning (planner.py:28-39) is strictly worse for skewed file sizes.
XML/HTML need whole-document parsing, so they read via ``wholetext``
(one row per file) and parse inside ``mapInPandas`` — fine for
many-small-files corpora; for huge single XML files a record-delimiter
split would be needed (not in reference scope).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """TextFileReader (remap.py:20-39): (filename, line) per text line."""
    return spark.read.text(path).select(
        F.input_file_name().alias("filename"), F.col("value").alias("line")
    )


def read_csv(
    spark: SparkSession, path: str, header: bool = True, infer_schema: bool = True
) -> DataFrame:
    """CSV source (reference parses CSV inside user map,
    secondarysort.py:14-17; here it is schema-first)."""
    return spark.read.csv(path, header=header, inferSchema=infer_schema)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_xml_elements(spark: SparkSession, path: str) -> DataFrame:
    """XMLFileReader (remap.py:43-66): parse each whole XML document
    with ElementTree, yield (filename, text) for every element that
    has text — same record stream as the reference's
    ``ET.fromstring(...).iter()`` walk.

    Parsing runs in mapInPandas (Arrow-batched); one input row per
    file via wholetext.
    """
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("filename"), F.col("value").alias("doc")
    )

    def parse(batches: Iterator) -> Iterator:
        import xml.etree.ElementTree as ET

        import pandas as pd

        for pdf in batches:
            files, texts = [], []
            for fname, doc in zip(pdf["filename"], pdf["doc"]):
                try:
                    root = ET.fromstring(doc)
                except ET.ParseError:
                    continue
                for elem in root.iter():
                    if elem.text is not None:
                        files.append(fname)
                        texts.append(elem.text)
            yield pd.DataFrame({"filename": files, "text": texts})

    return raw.mapInPandas(parse, schema="filename string, text string")


def read_html_text(spark: SparkSession, path: str) -> DataFrame:
    """HTMLFileReader (remap.py:68-90): feed each line to an HTMLParser,
    yield the LAST text node seen per line (the reference keeps only
    ``self.text`` — the most recent handle_data — per line,
    remap.py:84-90)."""
    raw = read_text(spark, path)

    def parse(batches: Iterator) -> Iterator:
        from html.parser import HTMLParser

        import pandas as pd

        class LastText(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.text: str | None = None

            def handle_data(self, data: str) -> None:
                stripped = data.strip()
                if stripped:
                    self.text = stripped

        for pdf in batches:
            files, texts = [], []
            # one parser per file, fed line-by-line (reference reuses
            # its parser across lines of a file, remap.py:73-79)
            parsers: dict[str, LastText] = {}
            for fname, line in zip(pdf["filename"], pdf["line"]):
                p = parsers.setdefault(fname, LastText())
                p.text = None
                p.feed(line)
                if p.text is not None:
                    files.append(fname)
                    texts.append(p.text)
            yield pd.DataFrame({"filename": files, "text": texts})

    return raw.mapInPandas(parse, schema="filename string, text string")


def read_adjacency(spark: SparkSession, path: str, valued: bool = False) -> DataFrame:
    """Graph file parsing (pagerank.py:13-26 / highest.py:11-24):
    whitespace-separated lines -> (id [, value], neighbors array).
    Pure column expressions — no UDF."""
    lines = spark.read.text(path).select(F.trim("value").alias("line"))
    lines = lines.where(F.length("line") > 0)
    toks = F.split("line", r"\s+")
    if valued:
        return lines.select(
            toks.getItem(0).alias("id"),
            toks.getItem(1).cast("bigint").alias("value"),
            F.slice(toks, 3, 1_000_000).alias("neighbors"),
        )
    return lines.select(
        toks.getItem(0).alias("id"),
        F.slice(toks, 2, 1_000_000).alias("neighbors"),
    )


def adjacency_to_edges(adj: DataFrame) -> DataFrame:
    """Normalize (id, neighbors[]) -> (src, dst) edge relation."""
    return adj.select(
        F.col("id").alias("src"), F.explode("neighbors").alias("dst")
    )


def read_json(
    spark: SparkSession, path: str, schema: str | None = None, multiline: bool = False
) -> DataFrame:
    """Newline-delimited (or multiLine) JSON source. The reference ships
    JSON only as its intermediate value encoding (remap.py:138,158-159);
    here it is a first-class scan. Always pass ``schema`` in production:
    schema inference is an extra full pass over the data — unaffordable
    at 100 TB."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path, multiLine=multiline)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Opaque-blob source for multimodal corpora (images/audio/video as
    bytes + typed metadata): Spark's built-in ``binaryFile`` format,
    yielding (path, modificationTime, length, content). Feed the
    ``content`` column to operators/multimodal (decode / feature
    extraction run over Arrow batches there).

    Scale: the scan lists files distributedly and never splits a blob
    across tasks (a media file must be decoded whole); set
    ``glob`` (pathGlobFilter) to prune at LISTING time, before any
    bytes are read."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
