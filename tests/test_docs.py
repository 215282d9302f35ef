"""Executable documentation: every ```python block in docs/*.md runs
(the reference tests its book code in CI — `mdbook test`,
`.github/workflows/rust.yml:67-78`). Blocks in one file share a
namespace, so guides can build up state step by step; a block can opt
out with ```python notest (e.g. TPU-only or long-running snippets)."""

import pathlib
import re

import pytest

DOCS = sorted(
    pathlib.Path(__file__).resolve().parent.parent.glob("docs/*.md"))

_FENCE = re.compile(r"```python([^\n]*)\n(.*?)```", re.DOTALL)


def _blocks(path):
    text = path.read_text()
    out = []
    for m in _FENCE.finditer(text):
        opts, body = m.group(1).strip(), m.group(2)
        if "notest" in opts:
            continue
        out.append(body)
    return out


@pytest.mark.parametrize("doc", DOCS, ids=lambda p: p.name)
def test_doc_code_blocks_run(doc):
    blocks = _blocks(doc)
    if not blocks:
        pytest.skip("no testable python blocks")
    ns: dict = {}
    for i, body in enumerate(blocks):
        try:
            exec(compile(body, f"{doc.name}[block {i}]", "exec"), ns)
        except Exception as e:
            pytest.fail(f"{doc.name} block {i} failed: {e!r}")
