"""Property tests for the MEF workflow block grammar
(pyperustats_spark/sources/workflow.py, reference
MEF/steps/workflow.py:30-67): random step lists must parse exactly
when the grammar holds, and the parsed blocks must reproduce the
reference's slot/override semantics."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyperustats_spark.sources.workflow import (
    ClickBtn, Rows, SavePartial, Search, Step, parse_workflow,
    workflow_columns,
)


class Bogus:
    """A step type the grammar does not know."""


def _mk(tag: str):
    return {
        "rows": Rows(["r"]),
        "click": ClickBtn("fooBtnBar"),
        "save": SavePartial("p"),
        "search": Search("q"),
        "bogus": Bogus(),
    }[tag]


TAGS = st.sampled_from(["rows", "click", "save", "search", "bogus"])


def _expected_valid(tags: list[str]) -> bool:
    if not tags:
        return True
    if tags[0] != "rows":
        return False
    if "bogus" in tags:
        return False
    # split into Rows-delimited blocks; each needs >=1 click
    blocks, cur = [], None
    for t in tags:
        if t == "rows":
            if cur is not None:
                blocks.append(cur)
            cur = []
        else:
            cur.append(t)
    blocks.append(cur)
    return all("click" in b for b in blocks)


@settings(max_examples=300, deadline=None)
@given(st.lists(TAGS, max_size=12))
def test_parse_accepts_iff_grammar_holds(tags):
    raw = [_mk(t) for t in tags]
    if _expected_valid(tags):
        steps = parse_workflow(raw)
        assert len(steps) == tags.count("rows")
        assert all(isinstance(s, Step) and s.click is not None
                   for s in steps)
        # block boundaries: step i's rows is the i-th Rows in raw
        rows_in_raw = [x for x in raw if isinstance(x, Rows)]
        assert [s.rows for s in steps] == rows_in_raw
    else:
        with pytest.raises(ValueError):
            parse_workflow(raw)


def test_last_wins_override_within_block():
    """The reference loop assigns `click = current` on every ClickBtn,
    so a repeated slot inside one block keeps the LAST value."""
    first, second = ClickBtn("aBtnX"), ClickBtn("aBtnY")
    steps = parse_workflow([Rows(), first, SavePartial("p1"), second,
                            SavePartial("p2")])
    assert len(steps) == 1
    assert steps[0].click is second
    assert steps[0].save.filename_prefix == "p2"


def test_reference_example_workflow_parses():
    """The module-level example from workflow.py:70-126 (input ->
    output): five blocks, with save/search landing on the documented
    blocks."""
    raw = [
        Rows(["total"]), ClickBtn("nivGobBtnNivelGobierno"),
        Rows(["locales"]), ClickBtn("nivGobBtnMancomunidades"),
        Rows(["municipalidades"]), ClickBtn("nivGobBtnGenerica"),
        Rows(), ClickBtn("nivGobBtnDepartamento"),
        SavePartial(filename_prefix="departamento"),
        Rows(["ica", "junin", "piura"]), ClickBtn("nivGobBtnMunicipalidad"),
        Search("provincial"),
    ]
    steps = parse_workflow(raw)
    assert [s.rows.rows for s in steps] == [
        ["total"], ["locales"], ["municipalidades"], [],
        ["ica", "junin", "piura"]]
    assert steps[3].save is not None and steps[3].save.filename_prefix == "departamento"
    assert steps[4].search is not None and steps[4].search.query == "provincial"
    assert [s.save for s in steps[:3]] == [None, None, None]


def test_error_messages_match_reference_contract():
    with pytest.raises(ValueError, match="Se esperaba Rows en posición 0"):
        parse_workflow([ClickBtn("b")])
    with pytest.raises(ValueError, match="no tiene ClickBtn"):
        parse_workflow([Rows(["x"])])
    with pytest.raises(ValueError, match="Tipo inesperado en posición 2"):
        parse_workflow([Rows(), ClickBtn("b"), Bogus()])


def test_clickbtn_name_derivation_and_columns():
    """name = trailing segment after 'Btn', else the raw button id
    (reference ClickBtn.__post_init__); workflow_columns keeps only
    as_column clicks, in order."""
    assert ClickBtn("nivGobBtnDepartamento").name == "Departamento"
    assert ClickBtn("plain_id").name == "plain_id"
    assert ClickBtn("aBtnXBtnY").name == "Y"
    steps = parse_workflow([
        Rows(), ClickBtn("aBtnOne"),
        Rows(), ClickBtn("hidden", as_column=False),
        Rows(), ClickBtn("aBtnTwo"),
    ])
    assert workflow_columns(steps) == ["One", "Two"]
