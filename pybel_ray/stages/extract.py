"""Stateless HTML -> text extraction (byte-identical per url).

The per-row invariant (BASELINE.json input_hint): when a page row already
carries ``text``, it passes through untouched; when ``text`` is NULL the
text is recovered from ``html`` deterministically.  The synthetic corpus
wraps text as ``<pre>...</pre>`` with HTML entity escaping, so extraction is
exactly invertible; for arbitrary HTML a deterministic tag-strip fallback
applies.

Runs as a stateless ``map_batches`` over zero-copy Arrow batches — no actor
state needed.
"""

from __future__ import annotations

import html as html_mod
import re

import pyarrow as pa

__all__ = ["extract_text_from_html", "ExtractText"]

_PRE_RE = re.compile(r"<pre>(.*?)</pre>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text_from_html(html: bytes) -> str:
    """Deterministically extract text from an HTML payload."""
    raw = html.decode("utf8", errors="replace")
    m = _PRE_RE.search(raw)
    if m is not None:
        return html_mod.unescape(m.group(1))
    return html_mod.unescape(_TAG_RE.sub(" ", raw))


class ExtractText:
    """``map_batches`` callable: fill NULL ``text`` from ``html``.

    Plain function-style stage (stateless); kept as a class so the pipeline
    can pass it either as tasks or actors uniformly.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch.column("text")
        if text.null_count == 0:
            return batch
        # decode ONLY the null rows (mask first); non-null text is never
        # touched, so a mostly-pre-extracted corpus costs one fill pass
        null_mask = pc.is_null(text)
        null_idx = pc.indices_nonzero(null_mask)
        html_vals = pc.take(batch.column("html"), null_idx).to_pylist()
        extracted = pa.array(
            [extract_text_from_html(h) for h in html_vals], pa.string(),
        )
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        filled = pc.replace_with_mask(text, null_mask.combine_chunks()
                                      if isinstance(null_mask, pa.ChunkedArray)
                                      else null_mask, extracted)
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", filled,
        )
