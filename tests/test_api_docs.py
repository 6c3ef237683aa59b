"""The fenced python blocks in docs/api.md are executable specs: run them.

The reference's API docs embed executable examples in docstrings
(reference nerfacc/scan.py:37-44 etc. render into docs/apis/*.rst); here
the examples live in docs/api.md and this test keeps them honest — a doc
that drifts from the code fails CI.
"""
import os
import re

API_MD = os.path.join(os.path.dirname(__file__), "..", "docs", "api.md")


def test_api_md_examples_execute():
    text = open(API_MD).read()
    blocks = re.findall(r"```python\n(.*?)```", text, re.S)
    assert len(blocks) >= 7, "expected the executable example blocks"
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"docs/api.md[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            raise AssertionError(
                f"docs/api.md example block {i} failed: {e}\n---\n{block}"
            ) from e
