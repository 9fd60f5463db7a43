"""INEI survey registry + module-frame enrichment.

Reference: ``perustats/inei/surveys/registry.py:20-108`` (the
``Survey`` dataclass + ``SurveyRegistry`` with register/get/
list_codes/contains semantics and the five built-in surveys) and
``perustats/inei/module_fetcher.py:37-52`` (``ModuleFetcher.fetch``
enriches the scraped module table with survey context columns and
initialises the progress columns that the downloader/organizer flags
later).

The registry is driver-side metadata on purpose — it names a handful
of surveys, never rows. The Spark-side piece is :func:`module_frame`:
given the per-module rows (the scrape itself is out of scope in this
environment), produce the exact frame the reference's progress
pipeline consumes, ready for
:class:`~pyperustats_spark.sources.progress.StageProgressTracker`
planning at any module count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PERIOD_ALIASES = {
    "anual": ["anual", "unico"],
    "panel": ["panel"],
}


@dataclass(frozen=True)
class Survey:
    """One INEI survey (reference registry.py:20-47)."""

    code: str
    name: str
    period: str = "anual"

    @property
    def period_aliases(self) -> list[str]:
        return _PERIOD_ALIASES.get(self.period, [self.period])

    def __str__(self) -> str:  # reference registry.py:45-46
        return f"{self.code} ({self.period}): {self.name}"


class SurveyRegistry:
    """Central survey store (reference registry.py:49-96): duplicate
    registration raises, unknown lookups raise with the available
    codes, ``list_codes`` filters by period, membership via ``in``."""

    def __init__(self) -> None:
        self._store: dict[str, Survey] = {}

    def register(self, survey: Survey) -> "SurveyRegistry":
        if survey.code in self._store:
            raise ValueError(f"Survey '{survey.code}' is already registered.")
        self._store[survey.code] = survey
        return self

    def get(self, code: str) -> Survey:
        if code not in self._store:
            available = ", ".join(sorted(self._store))
            raise KeyError(
                f"Unknown survey code '{code}'. Available codes: {available}")
        return self._store[code]

    def list_codes(self, period: str | None = None) -> list[str]:
        if period is None:
            return sorted(self._store)
        return sorted(
            s.code for s in self._store.values() if s.period == period)

    def all(self) -> list[Survey]:
        return list(self._store.values())

    def __contains__(self, code: str) -> bool:
        return code in self._store

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The registry as a (tiny) DataFrame so survey metadata can
        join progress/module frames — #surveys rows, broadcast-class."""
        return spark.createDataFrame(
            [(s.code, s.name, s.period) for s in self.all()],
            "survey string, name string, period string")


# built-in surveys (reference registry.py:101-108)
registry = SurveyRegistry()
registry.register(Survey(
    "enaho", "Condiciones de Vida y Pobreza - ENAHO", "anual"))
registry.register(Survey(
    "enaho_panel", "Condiciones de Vida y Pobreza - ENAHO Panel", "panel"))
registry.register(Survey(
    "enapres",
    "Encuesta Nacional de Programas Presupuestales - ENAPRES", "anual"))
registry.register(Survey(
    "endes", "Encuesta Demográfica y de Salud Familiar - ENDES", "anual"))
registry.register(Survey(
    "renamu", "Registro Nacional de Municipalidades - RENAMU", "anual"))


PROGRESS_COLS = ("url", "path_download", "path_extract", "path_organized")


def module_frame(modules: DataFrame, survey: Survey,
                 year: int) -> DataFrame:
    """Reference ``ModuleFetcher.fetch`` (module_fetcher.py:37-52)
    minus the HTTP: enrich a per-module frame with the survey context
    columns (survey/year/periodo) and initialise the NULL progress
    columns the downloader/organizer stages fill in later.

    Pure column appends — zero shuffles at any module count; the
    result is exactly what StageProgressTracker.plan() consumes."""
    out = (
        modules
        .withColumn("survey", F.lit(survey.code))
        .withColumn("year", F.lit(year))
        .withColumn("periodo", F.lit(survey.period))
    )
    for col in PROGRESS_COLS:
        out = out.withColumn(col, F.lit(None).cast("string"))
    return out
