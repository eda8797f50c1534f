from citation_graph_spark.fixtures.corpus import (
    generate_documents,
    expected_references,
    documents_spark_df,
    write_corpus_parquet,
)

__all__ = [
    "generate_documents",
    "expected_references",
    "documents_spark_df",
    "write_corpus_parquet",
]
