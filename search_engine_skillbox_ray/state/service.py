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

import datetime
import threading
from pathlib import Path

from ..pipelines.build import BuildConfig, build_index_from_pages
from .engine import SearchEngine
from .manifest import atomic_write_json, read_json
from .updater import IndexUpdater

STOPPED_BY_USER = "Индексация остановлена пользователем"  # IndexingServiceImpl.java:130


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
        self._stop_requested = False
        self._lock = threading.Lock()
        self._engine: SearchEngine | None = None

    # -- site status lifecycle (model/SiteEntity.java:11-29; transitions
    # -- at service/IndexingServiceImpl.java:264-284, stop :116-135) ----
    def _status_path(self) -> Path:
        return self.index_dir / "site_status.json"

    def _set_status(self, status: str, error: str | None = None, only_status: str | None = None) -> None:
        """Set status(+status_time,+last_error) for all sites, or only
        those currently in ``only_status``."""
        self.index_dir.mkdir(parents=True, exist_ok=True)
        cur = (read_json(self._status_path()) or {}).get("sites", {})
        now = datetime.datetime.now().isoformat(timespec="seconds")
        for s in self.sites:
            key = str(int(s["site_id"]))
            entry = cur.get(key, {})
            if only_status is not None and entry.get("status") != only_status:
                continue
            cur[key] = {
                "status": status,
                "status_time": now,
                "last_error": error,
            }
        atomic_write_json(self._status_path(), {"sites": cur})

    def site_statuses(self) -> dict:
        return (read_json(self._status_path()) or {}).get("sites", {})

    # ------------------------------------------------------------------
    def start_indexing(self, pages, *, input_token: str = "", pages_path: str | None = None) -> dict:
        with self._lock:
            if self._running:
                return {"result": False, "error": "Индексация уже запущена"}
            self._running = True
            self._stop_requested = False
        self._set_status("INDEXING")
        try:
            build_index_from_pages(
                pages, self.index_dir, self.sites, self.cfg,
                input_token=input_token, pages_path=pages_path,
            )
            self._engine = None  # rebuilt → drop caches
            if self._stop_requested:
                # reference: stop marks INDEXING sites FAILED (:116-135);
                # partial work is resumable via the partition markers
                self._set_status("FAILED", STOPPED_BY_USER, only_status="INDEXING")
                return {"result": True, "error": None}
            self._set_status("INDEXED")
            return {"result": True, "error": None}
        except Exception as ex:
            self._set_status("FAILED", f"Internal error: {ex}", only_status="INDEXING")
            return {"result": False, "error": f"Internal error: {ex}"}
        finally:
            self._running = False

    def stop_indexing(self) -> dict:
        # reference: stopping when already stopped is still result:true
        if self._running:
            self._stop_requested = True
            self._set_status("FAILED", STOPPED_BY_USER, only_status="INDEXING")
        self._running = False
        return {"result": True, "error": None}

    def index_page(self, url: str, html=None, text=None) -> dict:
        resp = IndexUpdater(self.index_dir).index_page(url, html=html, text=text)
        if resp.get("result") and self._engine is not None:
            self._engine.reload_updates()
        return resp

    def index_pages(self, pages, **kw) -> dict:
        """Micro-batch streaming ingestion: upsert a Dataset/table of
        pages as one LSM delta segment (state/updater.py docstring)."""
        resp = IndexUpdater(self.index_dir).index_pages(pages, **kw)
        if resp.get("result") and self._engine is not None:
            self._engine.reload_updates()
        return resp

    def compact(self) -> dict:
        """Fold delta segments + tombstones into the base segments."""
        resp = IndexUpdater(self.index_dir).compact()
        if self._engine is not None:
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
