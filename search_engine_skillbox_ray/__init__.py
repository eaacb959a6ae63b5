"""search_engine_skillbox_ray — a Ray-Data-native full-text index + search
engine with the query and data-processing capabilities of
``daniil0shcharbakou/Search_Engine_Skillbox`` (reference, read-only at
/root/reference), rebuilt from scratch on ``ray.data.Dataset`` pipelines:
zero-copy Arrow ``map_batches`` stages, actor pools for stateful steps, a
salted groupby-term shuffle building compressed posting segments, and a
segment-cached query layer (TF-IDF parity + BM25).

Layout:
  functions/  — pure per-record semantics (M1 extractor, M2 tokenizer,
                M4-M12 url/snippet/title functions)
  sources/    — Parquet pages source + corpus prep (dedup, docIDs)
  stages/     — codec (varbyte+block-max), tokenize-explode, posting build
  pipelines/  — build, dedup, ANN, text analysis, multimodal plumbing
  state/      — manifest (resume), query engine + actor pool
"""

from .pipelines.build import (  # noqa: F401
    BuildConfig,
    BuildResult,
    build_index_from_docs,
    build_index_from_documents_table,
    build_index_from_pages,
)
from .state.engine import QueryActorPool, SearchEngine  # noqa: F401
from .state.service import SearchEngineService  # noqa: F401
from .state.updater import IndexUpdater  # noqa: F401

__all__ = [
    "BuildConfig",
    "BuildResult",
    "build_index_from_docs",
    "build_index_from_documents_table",
    "build_index_from_pages",
    "SearchEngine",
    "QueryActorPool",
    "SearchEngineService",
    "IndexUpdater",
]
