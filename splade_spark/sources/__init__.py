from splade_spark.sources.pages import (  # noqa: F401
    documents_to_pages,
    load_documents,
    load_pages,
    load_table,
)
