"""Engine facade mirroring the reference's REST contract (SURVEY §2.11).

One Python object exposes the four endpoints' semantics without HTTP:

| reference endpoint        | method            | semantics source |
|---------------------------|-------------------|------------------|
| GET /api/startIndexing    | ``start_indexing``| controllers/ApiController.java:28-31 → service/IndexingServiceImpl.java:42-78 |
| GET /api/stopIndexing     | ``stop_indexing`` | :80-98 (already-stopped → result true) |
| POST /api/indexPage?url=  | ``index_page``    | :137-161 (delta path, state/updater.py) |
| GET /api/search           | ``search``        | service/SearchServiceImpl.java:25-71 |
| GET /api/statistics       | ``statistics``    | service/StatisticsServiceImpl.java:24-86 |

``start_indexing`` runs the full build (refusing while one runs —
"Индексация уже запущена", :47); stop sets the cancel flag the build
loop would observe (the Ray build is one streaming job, so stop takes
effect between partition commits — partial work is resumable, which
replaces the reference's mark-sites-FAILED semantics at :116-135).
"""

from __future__ import annotations

import threading
from pathlib import Path

from ..pipelines.build import BuildConfig, build_index_from_pages
from .engine import SearchEngine
from .updater import IndexUpdater


class SearchEngineService:
    def __init__(
        self,
        index_dir: str | Path,
        sites: list[dict],
        cfg: BuildConfig | None = None,
    ) -> None:
        self.index_dir = Path(index_dir)
        self.sites = sites
        self.cfg = cfg or BuildConfig()
        self._running = False
        self._lock = threading.Lock()
        self._engine: SearchEngine | None = None

    # ------------------------------------------------------------------
    def start_indexing(self, pages, *, input_token: str = "", pages_path: str | None = None) -> dict:
        with self._lock:
            if self._running:
                return {"result": False, "error": "Индексация уже запущена"}
            self._running = True
        try:
            build_index_from_pages(
                pages, self.index_dir, self.sites, self.cfg,
                input_token=input_token, pages_path=pages_path,
            )
            self._engine = None  # rebuilt → drop caches
            return {"result": True, "error": None}
        except Exception as ex:
            return {"result": False, "error": f"Internal error: {ex}"}
        finally:
            self._running = False

    def stop_indexing(self) -> dict:
        # reference: stopping when already stopped is still result:true
        self._running = False
        return {"result": True, "error": None}

    def index_page(self, url: str, html=None, text=None) -> dict:
        resp = IndexUpdater(self.index_dir).index_page(url, html=html, text=text)
        if resp.get("result") and self._engine is not None:
            self._engine.reload_updates()
        return resp

    # ------------------------------------------------------------------
    def _eng(self) -> SearchEngine:
        if self._engine is None:
            self._engine = SearchEngine(self.index_dir)
        return self._engine

    def search(self, query: str, site: str | None = None, offset: int = 0, limit: int = 10) -> dict:
        return self._eng().search(query, site=site, offset=offset, limit=limit)

    def statistics(self) -> dict:
        stats = self._eng().statistics()
        stats["statistics"]["total"]["indexing"] = self._running
        return stats
