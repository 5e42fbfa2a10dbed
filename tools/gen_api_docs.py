#!/usr/bin/env python
"""Generate the markdown API reference from docstrings.

The reference publishes a Sphinx/readthedocs API site (SURVEY.md §2.1 #17);
this environment has no sphinx, so this self-contained generator walks the
package with ``inspect`` and emits one markdown page per module under
``docs/api/`` plus an index.  Run from the repo root::

    python tools/gen_api_docs.py

The output is checked in so the API reference ships with the repo.
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

PACKAGE = "pystencils_autodiff_tpu"
OUT = ROOT / "docs" / "api"


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d or ""


def _indent_doc(doc: str) -> str:
    return "\n".join(doc.splitlines())


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        mod_of = getattr(obj, "__module__", None)
        if mod_of is not None and not str(mod_of).startswith(PACKAGE):
            continue  # re-exported third-party symbol
        out.append((n, obj))
    return out


def render_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    if _doc(mod):
        lines += [_indent_doc(_doc(mod)), ""]
    for name, obj in _public_members(mod):
        if inspect.isclass(obj):
            lines += [f"## class `{name}{_sig(obj)}`", ""]
            if _doc(obj):
                lines += [_indent_doc(_doc(obj)), ""]
            for mname, meth in inspect.getmembers(obj):
                if mname.startswith("_") or not callable(meth):
                    continue
                if mname not in vars(obj) and not any(
                        mname in vars(b) for b in obj.__mro__[1:-1]):
                    continue
                try:
                    owner_doc = _doc(meth)
                except Exception:
                    owner_doc = ""
                lines += [f"### `{name}.{mname}{_sig(meth)}`", ""]
                if owner_doc:
                    lines += [_indent_doc(owner_doc), ""]
        elif callable(obj):
            lines += [f"## `{name}{_sig(obj)}`", ""]
            if _doc(obj):
                lines += [_indent_doc(_doc(obj)), ""]
        else:
            lines += [f"## `{name}`", "", f"```python\n{name} = {obj!r}\n```", ""]
    return "\n".join(lines) + "\n"


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    pkg = importlib.import_module(PACKAGE)
    modules = [PACKAGE]
    for info in pkgutil.walk_packages(pkg.__path__, prefix=PACKAGE + "."):
        # backends import torch/tf lazily; skip modules that fail to import
        try:
            importlib.import_module(info.name)
        except Exception as e:  # noqa: BLE001
            print(f"skip {info.name}: {type(e).__name__}: {e}")
            continue
        modules.append(info.name)

    index = ["# API reference", "",
             f"Generated from docstrings by `tools/gen_api_docs.py` "
             f"(regenerate after API changes).", ""]
    for m in sorted(modules):
        page = m.replace(".", "_") + ".md"
        (OUT / page).write_text(render_module(m))
        index.append(f"- [`{m}`]({page})")
    (OUT / "index.md").write_text("\n".join(index) + "\n")
    print(f"wrote {len(modules)} pages to {OUT}")


if __name__ == "__main__":
    main()
