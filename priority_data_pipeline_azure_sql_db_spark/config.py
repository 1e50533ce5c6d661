"""extractionConfig model — the engine's job spec / "query language".

Mirrors the reference's MongoDB extractionConfig document
(reference readme.md:158-187; read path resources/mongodbHelper.py:62-90):
``{datasourceName, systemTimezone, entities:[{EntityID, filterFlag,
filterField, expand[], lastRun, dataStartDate}]}``.

Semantics decisions (SURVEY.md Appendix A):
- keys accepted case-insensitively (code uses ``EntityID``, docs ``entityID``);
- ``incremental`` is a strict bool (the reference substring-matched ``'true'``,
  reference app.py:281);
- timestamps are parsed ``%Y-%m-%d %H:%M:%S`` in the config's
  ``systemTimezone`` and converted to UTC for filtering (the reference
  localizes with pytz and formats ISO-8601 for the OData ``$filter``,
  reference resources/priorityDataSource.py:676-679).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from zoneinfo import ZoneInfo

CONFIG_TS_FORMAT = "%Y-%m-%d %H:%M:%S"


def parse_bool(value: object) -> bool:
    """Strict bool parse (fixes reference app.py:281's substring test)."""
    if isinstance(value, bool):
        return value
    if isinstance(value, str):
        v = value.strip().lower()
        if v in ("true", "1", "yes"):
            return True
        if v in ("false", "0", "no", ""):
            return False
    raise ValueError(f"not a boolean: {value!r}")


def _ci_get(d: dict, key: str, default=None):
    """Case-insensitive dict get (EntityID vs entityID, SURVEY.md App. A)."""
    lowered = {k.lower(): v for k, v in d.items()}
    return lowered.get(key.lower(), default)


@dataclass
class EntityConfig:
    """One entity (table) extraction spec."""

    entity_id: str
    filter_flag: bool = False
    filter_field: str = ""
    expand: list[str] = field(default_factory=list)
    last_run: str | None = None        # "%Y-%m-%d %H:%M:%S" in system tz
    data_start_date: str | None = None  # same format; full-load lower bound
    # Explicit parent-PK → child-FK map for sub-form joins, e.g.
    # {"o_orderkey": "l_orderkey"}. When a key is absent the engine falls
    # back to the suffix-stem heuristic (pipeline._child_key) — which
    # REFUSES ambiguous schemas with a ValueError (never a silent pick),
    # so schemas where two child columns share the stem must configure
    # this map explicitly.
    expand_keys: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "EntityConfig":
        return cls(
            entity_id=str(_ci_get(d, "EntityID")),
            filter_flag=parse_bool(_ci_get(d, "filterFlag", False)),
            filter_field=str(_ci_get(d, "filterField", "") or ""),
            expand=list(_ci_get(d, "expand", []) or []),
            last_run=_ci_get(d, "lastRun"),
            data_start_date=_ci_get(d, "dataStartDate"),
            expand_keys=dict(_ci_get(d, "expandKeys", {}) or {}),
        )

    def lower_bound(self, incremental: bool) -> str | None:
        """Pick the watermark lower bound (O4): lastRun when incremental,
        dataStartDate on full load (reference resources/priorityDataSource.py:660-669)."""
        if not self.filter_flag:
            return None
        return self.last_run if incremental else self.data_start_date


@dataclass
class ExtractionConfig:
    datasource_name: str
    system_timezone: str = "UTC"
    entities: list[EntityConfig] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict) -> "ExtractionConfig":
        return cls(
            datasource_name=str(_ci_get(d, "datasourceName", "local")),
            system_timezone=str(_ci_get(d, "systemTimezone", "UTC") or "UTC"),
            entities=[EntityConfig.from_dict(e) for e in (_ci_get(d, "entities", []) or [])],
        )

    def to_utc(self, ts: str) -> datetime:
        """Parse a config-format timestamp in system tz → aware UTC datetime.

        Preserves the reference's tz discipline (bookmarks live in
        source-system local time) while the engine computes in UTC.
        """
        naive = datetime.strptime(ts, CONFIG_TS_FORMAT)
        return naive.replace(tzinfo=ZoneInfo(self.system_timezone)).astimezone(ZoneInfo("UTC"))

    def format_bookmark(self, utc_dt: datetime) -> str:
        """UTC datetime → config-format string in system tz (lastRun write-back,
        reference resources/priorityDataSource.py:605)."""
        return utc_dt.astimezone(ZoneInfo(self.system_timezone)).strftime(CONFIG_TS_FORMAT)
