"""README-as-test: every ```python block in README.md must run verbatim
(reference discipline: python/test/test_readme.py executes its README
snippets against a generated file)."""

from __future__ import annotations

import os
import re

import pytest


def _python_blocks() -> list[str]:
    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    with open(readme) as f:
        text = f.read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


def test_readme_has_python_blocks():
    assert len(_python_blocks()) >= 2


def test_readme_blocks_execute():
    """All blocks share one namespace (later blocks reuse `path` etc.),
    exactly as a reader following the README top-to-bottom would."""
    blocks = _python_blocks()
    ns: dict = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"README.md[python#{i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(f"README python block {i} failed: {e}\n---\n{block}")
