"""Parallel style/lint runner — the CI gate the reference runs via
clang-format (reference: tools/clang-format-all.py:1-7, a multiprocessing
clang-format wrapper). No external formatter is vendored here; the checks
are self-contained:

Python (*.py):   parses (ast), no tabs in indentation, no trailing
                 whitespace, newline at EOF, line length <= 88
                 (suppress with a trailing ``# noqa: long-line``).
C++ (*.cpp/h):   no tabs, no trailing whitespace, newline at EOF,
                 line length <= 100.

Usage: python tools/lint.py [--fix] [paths...]
  --fix rewrites trailing whitespace / missing EOF newline in place.
Exit status 0 = clean, 1 = findings (prints file:line: message).

tests/test_lint.py runs this over the repo, so `pytest` is the CI.
"""
from __future__ import annotations

import ast
import multiprocessing.dummy as mp
import sys
from pathlib import Path

PY_MAX = 88
CC_MAX = 100
SKIP_DIRS = {".git", "__pycache__", ".claude", "goldens", "data"}


def repo_files(roots):
    for root in roots:
        p = Path(root)
        if p.is_file():
            yield p
            continue
        for f in sorted(p.rglob("*")):
            if any(part in SKIP_DIRS for part in f.parts):
                continue
            if f.suffix in (".py", ".cpp", ".cc", ".h", ".hpp"):
                yield f


def check_file(path: Path, fix: bool = False):
    issues = []
    try:
        raw = path.read_bytes()
    except OSError as e:
        return [f"{path}: unreadable ({e})"]
    text = raw.decode("utf-8", errors="replace")
    is_py = path.suffix == ".py"
    max_len = PY_MAX if is_py else CC_MAX

    if is_py:
        try:
            ast.parse(text, filename=str(path))
        except SyntaxError as e:
            return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    lines = text.split("\n")
    changed = False
    for i, line in enumerate(lines, 1):
        if line != line.rstrip():
            if fix:
                lines[i - 1] = line.rstrip()
                changed = True
            else:
                issues.append(f"{path}:{i}: trailing whitespace")
        if is_py and line[: len(line) - len(line.lstrip())].count("\t"):
            issues.append(f"{path}:{i}: tab in indentation")
        if len(line) > max_len and "noqa: long-line" not in line:
            issues.append(f"{path}:{i}: line too long ({len(line)} > {max_len})")
    if text and not text.endswith("\n"):
        if fix:
            lines.append("")
            changed = True
        else:
            issues.append(f"{path}: no newline at end of file")
    if fix and changed:
        path.write_text("\n".join(lines), encoding="utf-8")
    return issues


def main(argv):
    fix = "--fix" in argv
    roots = [a for a in argv if not a.startswith("--")] or [
        "primitive3d_tpu", "tests", "tools", "examples", "native",
        "bench.py", "__graft_entry__.py",
    ]
    files = list(repo_files(roots))
    with mp.Pool(8) as pool:
        per_file = pool.map(lambda f: check_file(f, fix), files)
    issues = [msg for batch in per_file for msg in batch]
    for msg in issues:
        print(msg)
    print(f"lint: {len(files)} files, {len(issues)} issue(s)",
          file=sys.stderr)
    return 1 if issues else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
