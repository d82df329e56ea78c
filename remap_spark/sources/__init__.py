from .readers import (
    adjacency_to_edges,
    read_adjacency,
    read_csv,
    read_html_text,
    read_parquet,
    read_text,
    read_xml_elements,
)
from .writers import write_intermediate_text, write_parquet, write_reduce_text

__all__ = [
    "read_text",
    "read_csv",
    "read_parquet",
    "read_xml_elements",
    "read_html_text",
    "read_adjacency",
    "adjacency_to_edges",
    "write_parquet",
    "write_reduce_text",
    "write_intermediate_text",
]
