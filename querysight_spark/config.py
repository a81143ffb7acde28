"""Engine configuration with the reference's validate contract.

The reference loads a dotenv environment and exposes a ``Config`` class
whose ``validate_config()`` returns ``(is_valid, missing_vars)``
(/root/reference/utils/config.py:12-57). This engine deliberately reads
NOTHING from the environment — every setting is an explicit constructor
argument supplied by the CLI or the embedding application — but keeps the
same validation shape so callers can fail fast with the same UX: a bool
plus the exact list of missing settings.

Numeric/range checks go beyond the reference (which only checks
non-emptiness): bad values fail at config time, not three stages into an
analysis run.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    """Settings for one analysis run. Only ``cache_dir`` and
    ``dbt_project_path`` are required by ``validate()`` when the
    corresponding feature is used; connection/provider blocks are optional
    feature groups validated as units."""

    cache_dir: str = ""
    dbt_project_path: str = ""
    # external query-log source (optional; see sources.jdbc_log)
    jdbc_url: str = ""
    jdbc_table: str = "system.query_log"
    jdbc_user: str = ""
    jdbc_password: str = ""
    # LLM provider (optional; see plans.providers)
    llm_base_url: str = ""
    llm_model: str = ""
    llm_api_key: str = ""
    # analysis knobs
    days: int = 7
    min_frequency: int = 2
    sample_fraction: float | None = None
    page_size: int = 20
    require: tuple[str, ...] = field(default=("cache_dir", "dbt_project_path"))

    def validate(self) -> tuple[bool, list[str]]:
        """(is_valid, problems): missing required settings, half-configured
        feature groups, and out-of-range knobs."""
        problems: list[str] = []
        for name in self.require:
            if not str(getattr(self, name, "")).strip():
                problems.append(name)
        if self.jdbc_url and not self.jdbc_table.strip():
            problems.append("jdbc_table")
        if self.llm_base_url and not self.llm_model.strip():
            problems.append("llm_model")
        if self.days <= 0:
            problems.append("days (must be > 0)")
        if self.min_frequency < 1:
            problems.append("min_frequency (must be >= 1)")
        if self.sample_fraction is not None and not (0.0 < self.sample_fraction <= 1.0):
            problems.append("sample_fraction (must be in (0, 1])")
        if self.page_size <= 0:
            problems.append("page_size (must be > 0)")
        return len(problems) == 0, problems
