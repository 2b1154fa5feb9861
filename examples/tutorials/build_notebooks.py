"""Generate Jupyter notebooks from the tutorial scripts.

The .py scripts are the source of truth (runnable, tested in CI); this
converts each into an .ipynb with the module docstring and the
`# ----` comment banners as markdown cells, mirroring the reference's
notebook-based tutorial format. Run from this directory:

    python build_notebooks.py
"""
import ast
import json
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))
NB_DIR = os.path.join(HERE, "notebooks")


def _md_cell(text):
    return {"cell_type": "markdown", "metadata": {},
            "source": text.splitlines(keepends=True)}


def _code_cell(code):
    return {"cell_type": "code", "metadata": {}, "execution_count": None,
            "outputs": [], "source": code.splitlines(keepends=True)}


def split_script(src):
    """(docstring, [(banner_text or None, code_block), ...])"""
    mod = ast.parse(src)
    doc = ast.get_docstring(mod) or ""
    body = src.splitlines()
    # Drop the module docstring lines
    first = mod.body[0]
    if isinstance(first, ast.Expr) and isinstance(first.value, ast.Constant):
        body = body[first.end_lineno:]

    # Split on banner comment blocks delimited by "# ----" rules
    banner_re = re.compile(r"^# -{10,}$")
    cells = []
    code, banner = [], None
    i = 0
    while i < len(body):
        line = body[i]
        if banner_re.match(line.strip()):
            if any(l.strip() for l in code):
                cells.append((banner, "\n".join(code).strip("\n")))
            banner_lines = []
            i += 1
            while i < len(body) and body[i].lstrip().startswith("#") \
                    and not banner_re.match(body[i].strip()):
                banner_lines.append(body[i].lstrip("# ").rstrip())
                i += 1
            if i < len(body) and banner_re.match(body[i].strip()):
                i += 1
            banner = " ".join(banner_lines)
            code = []
        else:
            code.append(line)
            i += 1
    if any(l.strip() for l in code):
        cells.append((banner, "\n".join(code).strip("\n")))
    return doc, cells


def build_notebook(script_path):
    src = open(script_path).read()
    doc, blocks = split_script(src)
    cells = [_md_cell(f"# {doc.splitlines()[0]}\n\n"
                      + "\n".join(doc.splitlines()[1:]).strip())]
    for banner, code in blocks:
        if banner:
            cells.append(_md_cell(f"**{banner}**"))
        cells.append(_code_cell(code))
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def main():
    os.makedirs(NB_DIR, exist_ok=True)
    scripts = sorted(f for f in os.listdir(HERE)
                     if f[0].isdigit() and f.endswith(".py"))
    for script in scripts:
        nb = build_notebook(os.path.join(HERE, script))
        dest = os.path.join(NB_DIR, script.replace(".py", ".ipynb"))
        with open(dest, "w") as f:
            json.dump(nb, f, indent=1)
        print(f"wrote {os.path.relpath(dest, HERE)} "
              f"({len(nb['cells'])} cells)")


if __name__ == "__main__":
    main()
