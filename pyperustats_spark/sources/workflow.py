"""MEF consulta-amigable workflow grammar: validate a flat step list
into Steps before any execution engine touches it.

Reference: ``perustats/MEF/steps/click.py`` (the ``Rows`` /
``ClickBtn`` / ``SavePartial`` / ``Search`` step vocabulary) and
``perustats/MEF/steps/workflow.py:30-67`` (``Workflow._parse`` — the
block grammar: every block opens with ``Rows``, absorbs at most one
each of the other step kinds until the next ``Rows``, and must
contain a ``ClickBtn``).

This is driver-side configuration validation, same scope as
:class:`~pyperustats_spark.sources.surveys.SurveyRegistry`: it names
a handful of navigation steps, never rows, so there is no Spark plan
here — the value is failing a malformed pipeline definition at submit
time instead of mid-crawl. The Selenium execution itself is out of
scope in this environment (no network); what downstream stages
consume is the validated ``Step`` list (and, per ``ClickBtn``'s
``as_column`` contract, the provenance column names the navigation
would stamp onto scraped frames).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Rows:
    """Row filter for the visible table: keep rows matching any of the
    given patterns; an empty list means iterate every row (reference
    click.py ``Rows``)."""

    rows: list[str] = field(default_factory=list)
    on_missing: str = "record"  # skip | record | raise


@dataclass
class ClickBtn:
    """A button click; ``name`` (the provenance column the reference
    stamps when ``as_column``) derives from the trailing segment of the
    button id after ``Btn`` (reference click.py ``ClickBtn``)."""

    button: str
    as_column: bool = True

    @property
    def name(self) -> str:
        return self.button.split("Btn")[-1] if "Btn" in self.button else self.button


@dataclass
class SavePartial:
    """Checkpoint marker: persist progress from this block onward
    (reference click.py ``SavePartial``)."""

    filename_prefix: str | None = None


@dataclass
class Search:
    """Backend search to shrink an oversized table before row
    iteration (reference click.py ``Search``)."""

    query: str | None = None
    method: str = "description"  # description | code


@dataclass
class Step:
    """One validated navigation block (reference workflow.py ``Step``)."""

    rows: Rows
    click: ClickBtn
    save: SavePartial | None = None
    search: Search | None = None


_SLOTS = {ClickBtn: "click", SavePartial: "save", Search: "search"}


def parse_workflow(raw: list) -> list[Step]:
    """Validate a flat step list into blocks (reference
    ``Workflow._parse``, workflow.py:30-67).

    Grammar: a block opens with ``Rows`` and runs until the next
    ``Rows`` (or the end). Inside a block, ``ClickBtn`` / ``SavePartial``
    / ``Search`` each fill their slot (a repeat overwrites — last
    wins, as in the reference). ``ValueError`` on: a block that does
    not open with ``Rows``, an unknown step type, or a block with no
    ``ClickBtn``."""
    steps: list[Step] = []
    block_rows: Rows | None = None
    slots: dict[str, object] = {}

    def close_block(pos_hint: Rows) -> None:
        if "click" not in slots:
            raise ValueError(
                f"Bloque con Rows({pos_hint.rows}) no tiene ClickBtn")
        steps.append(Step(rows=pos_hint, click=slots["click"],
                          save=slots.get("save"),
                          search=slots.get("search")))

    for i, item in enumerate(raw):
        if isinstance(item, Rows):
            if block_rows is not None:
                close_block(block_rows)
            block_rows, slots = item, {}
            continue
        if block_rows is None:
            raise ValueError(
                f"Se esperaba Rows en posición {i}, se obtuvo "
                f"{type(item).__name__}")
        slot = _SLOTS.get(type(item))
        if slot is None:
            raise ValueError(
                f"Tipo inesperado en posición {i}: {type(item).__name__}")
        slots[slot] = item
    if block_rows is not None:
        close_block(block_rows)
    return steps


def workflow_columns(steps: list[Step]) -> list[str]:
    """The provenance column names a validated workflow would stamp on
    scraped frames — every ``as_column`` click's derived ``name``, in
    navigation order (reference ClickBtn.as_column contract)."""
    return [s.click.name for s in steps if s.click.as_column]
