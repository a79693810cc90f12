"""Generate the per-module API reference (``docs/api/*.md``) from the
LIVE public surface.

The reference ships a Sphinx page per module
(``/root/reference/docs/api/*``); this generator produces the same
per-symbol coverage as deterministic markdown: one page per public
``mdhelper_tpu`` module listing every public function/class (signature
+ first docstring paragraph) and every public method of each class.
``tests/test_api_docs.py`` regenerates in-memory and asserts the
committed pages match — API drift fails the suite until

    python scripts/gen_api_docs.py

is re-run.  Modules that cannot import in this environment (the
``openmm.*`` layer needs the real OpenMM) render from their AST
instead, so the pages are complete either way.
"""

import ast
import importlib
import inspect
import os
import pkgutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
API_DIR = os.path.join(ROOT, "docs", "api")


def public_modules():
    import mdhelper_tpu

    out = ["mdhelper_tpu"]
    for m in pkgutil.walk_packages(
        mdhelper_tpu.__path__, "mdhelper_tpu."
    ):
        if any(
            part.startswith("_") or "-" in part
            for part in m.name.split(".")
        ):
            continue
        out.append(m.name)
    return sorted(set(out))


def _first_paragraph(doc):
    if not doc:
        return "*(undocumented)*"
    para = doc.strip().split("\n\n")[0]
    lines = [
        line.strip()
        for line in para.splitlines()
        # drop RST title underlines ("====="/"-----")
        if line.strip() and set(line.strip()) - set("=-~^")
    ]
    return " ".join(lines) if lines else "*(undocumented)*"


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _render_symbol(name, obj, lines):
    if inspect.isclass(obj):
        lines.append(f"### class `{name}{_signature(obj)}`")
        lines.append("")
        lines.append(_first_paragraph(inspect.getdoc(obj)))
        lines.append("")
        for mname in sorted(vars(obj)):
            if mname.startswith("_"):
                continue
            meth = inspect.getattr_static(obj, mname)
            if isinstance(meth, (staticmethod, classmethod)):
                meth = meth.__func__
            if isinstance(meth, property):
                lines.append(f"- `{mname}` (property) — "
                             f"{_first_paragraph(meth.__doc__)}")
            elif inspect.isfunction(meth):
                lines.append(
                    f"- `{mname}{_signature(meth)}` — "
                    f"{_first_paragraph(meth.__doc__)}"
                )
        lines.append("")
    else:
        lines.append(f"### `{name}{_signature(obj)}`")
        lines.append("")
        lines.append(_first_paragraph(inspect.getdoc(obj)))
        lines.append("")


def _render_module_live(mod_name):
    mod = importlib.import_module(mod_name)
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [
            n
            for n, o in vars(mod).items()
            if not n.startswith("_")
            and (inspect.isfunction(o) or inspect.isclass(o))
            and getattr(o, "__module__", "").startswith(
                "mdhelper_tpu"
            )
        ]
    lines = [
        f"# `{mod_name}`",
        "",
        _first_paragraph(mod.__doc__),
        "",
    ]
    count = 0
    for name in sorted(set(names)):
        obj = getattr(mod, name, None)
        if obj is None or inspect.ismodule(obj):
            continue
        if not (
            inspect.isfunction(obj)
            or inspect.isclass(obj)
            or callable(obj)
        ):
            # public constants: one line
            lines.append(f"### `{name}`")
            lines.append("")
            lines.append(f"Constant of type `{type(obj).__name__}`.")
            lines.append("")
            count += 1
            continue
        _render_symbol(name, obj, lines)
        count += 1
    return "\n".join(lines) + "\n", count


def _render_module_ast(mod_name):
    path = os.path.join(
        ROOT, mod_name.replace(".", "/") + ".py"
    )
    if not os.path.exists(path):
        path = os.path.join(
            ROOT, mod_name.replace(".", "/"), "__init__.py"
        )
    tree = ast.parse(open(path).read())
    lines = [
        f"# `{mod_name}`",
        "",
        _first_paragraph(ast.get_docstring(tree)),
        "",
        "*(rendered from source — module needs OpenMM at import"
        " time)*",
        "",
    ]
    count = 0
    nodes = [
        n
        for n in tree.body
        if isinstance(
            n, (ast.FunctionDef, ast.ClassDef)
        )
        and not n.name.startswith("_")
    ]
    for node in sorted(nodes, key=lambda n: n.name):
        kind = (
            "class " if isinstance(node, ast.ClassDef) else ""
        )
        lines.append(f"### {kind}`{node.name}`")
        lines.append("")
        lines.append(_first_paragraph(ast.get_docstring(node)))
        lines.append("")
        if isinstance(node, ast.ClassDef):
            for sub in node.body:
                if isinstance(
                    sub, (ast.FunctionDef, ast.AsyncFunctionDef)
                ) and not sub.name.startswith("_"):
                    lines.append(
                        f"- `{sub.name}` — "
                        f"{_first_paragraph(ast.get_docstring(sub))}"
                    )
            lines.append("")
        count += 1
    return "\n".join(lines) + "\n", count


def render_all():
    """{relative page path: content} for every public module."""

    pages = {}
    total = 0
    index = [
        "# mdhelper_tpu API reference",
        "",
        "Generated by `scripts/gen_api_docs.py` — do not edit by"
        " hand; `tests/test_api_docs.py` fails on drift.",
        "",
    ]
    for mod_name in public_modules():
        try:
            content, count = _render_module_live(mod_name)
        except ImportError:
            content, count = _render_module_ast(mod_name)
        fname = mod_name.replace(".", "_") + ".md"
        pages[fname] = content
        total += count
        index.append(
            f"- [`{mod_name}`]({fname}) — {count} public symbols"
        )
    index.append("")
    index.append(f"Total: {total} documented public symbols.")
    index.append("")
    pages["index.md"] = "\n".join(index) + "\n"
    return pages


def main():
    os.makedirs(API_DIR, exist_ok=True)
    pages = render_all()
    stale = set(os.listdir(API_DIR)) - set(pages)
    for fname, content in pages.items():
        with open(os.path.join(API_DIR, fname), "w") as f:
            f.write(content)
    for fname in stale:
        os.remove(os.path.join(API_DIR, fname))
    print(
        f"wrote {len(pages)} pages to {API_DIR}"
        + (f"; removed {len(stale)} stale" if stale else "")
    )


if __name__ == "__main__":
    main()
