"""Static HTML / Jupyter visualization export — the last reference I/O
surface (ref ``io/jupyter/__init__.py:5-6``: ``to_html``,
``to_html_file``, ``to_html_path``, ``to_jupyter``, ``to_jupyter_str``).

Semantics parity with the reference (``io/jupyter/visualization.py:30-56``):
the artifact embeds the graph's node-link JSON document, a
function → CSS-color map (same default palette,
``io/jupyter/constants.py:8-19``) and the node/edge counts, and renders a
force-directed view colored by BEL function.  The rendering itself is a
from-scratch ~70-line vanilla-JS canvas spring layout instead of the
reference's jinja2 + jQuery + d3-CDN template — the produced file is fully
self-contained and renders offline.

Scale contract: visualization is inherently a driver-side artifact of a
SMALL graph (an induced subgraph, a query-protocol result) — it rides
:func:`~pybel_ray.export.nodelink.to_nodelink`, which assembles the whole
document on the driver.  Huge graphs should be filtered/induced first;
the streaming analog for bulk interchange is ``to_nodelink_jsonl_dir``.
"""

from __future__ import annotations

import json
from typing import Mapping, Optional

from .nodelink import to_nodelink

__all__ = [
    "DEFAULT_COLOR_MAP",
    "build_graph_context",
    "to_html",
    "to_html_file",
    "to_html_path",
    "to_jupyter",
    "to_jupyter_str",
]

#: BEL function -> CSS color, matching the reference palette
#: (ref io/jupyter/constants.py:8-19)
DEFAULT_COLOR_MAP = {
    "Protein": "#1F77B4",
    "Pathology": "#FF7F0E",
    "BiologicalProcess": "#2CA02C",
    "miRNA": "#D62728",
    "Complex": "#98DF8A",
    "Composite": "#9467BD",
    "Reaction": "#000000",
    "Gene": "#FFBB78",
    "Abundance": "#AEC7E8",
    "RNA": "#FF9896",
}

_FALLBACK_COLOR = "#888888"

#: minimal self-contained force layout: seeded deterministic positions,
#: spring relaxation, canvas draw, drag + hover tooltip.  Parameters: the
#: __PBR_*__ sentinels are substituted (unique strings that cannot occur in
#: user data; the graph JSON is inserted LAST so substitution never rewrites
#: token lookalikes inside user-controlled node/edge text).
_VIS_JS = r"""
(function () {
  var data = __PBR_GRAPH__, cmap = __PBR_CMAP__;
  var W = __PBR_WIDTH__, H = __PBR_HEIGHT__;
  var host = __PBR_HOST__;
  var canvas = document.createElement('canvas');
  canvas.width = W; canvas.height = H;
  canvas.style.border = '1px solid #ddd';
  host.appendChild(canvas);
  var ctx = canvas.getContext('2d');
  var n = data.nodes.length;
  // deterministic golden-angle seed positions (no Math.random: repeated
  // renders of the same artifact look identical)
  var nodes = data.nodes.map(function (d, i) {
    var r = 0.38 * Math.min(W, H) * Math.sqrt((i + 0.5) / n);
    var a = i * 2.39996322972865332;
    return {d: d, x: W / 2 + r * Math.cos(a), y: H / 2 + r * Math.sin(a),
            vx: 0, vy: 0};
  });
  var links = data.links.map(function (l) {
    return {s: nodes[l.source], t: nodes[l.target], d: l};
  });
  function step() {
    var i, j, k;
    for (i = 0; i < n; i++) {           // repulsion (capped O(n^2): the
      for (j = i + 1; j < n; j++) {     // driver-side small-graph contract)
        var a = nodes[i], b = nodes[j];
        var dx = b.x - a.x, dy = b.y - a.y;
        var d2 = dx * dx + dy * dy + 1e-4, f = 800 / d2;
        a.vx -= dx * f; a.vy -= dy * f; b.vx += dx * f; b.vy += dy * f;
      }
    }
    for (k = 0; k < links.length; k++) { // springs
      var e = links[k];
      var dx2 = e.t.x - e.s.x, dy2 = e.t.y - e.s.y;
      var dist = Math.sqrt(dx2 * dx2 + dy2 * dy2) || 1;
      var f2 = 0.02 * (dist - 60) / dist;
      e.s.vx += dx2 * f2; e.s.vy += dy2 * f2;
      e.t.vx -= dx2 * f2; e.t.vy -= dy2 * f2;
    }
    for (i = 0; i < n; i++) {            // integrate toward center, damped
      var p = nodes[i];
      p.vx += (W / 2 - p.x) * 0.002; p.vy += (H / 2 - p.y) * 0.002;
      p.x += p.vx * 0.5; p.y += p.vy * 0.5; p.vx *= 0.6; p.vy *= 0.6;
      p.x = Math.max(8, Math.min(W - 8, p.x));
      p.y = Math.max(8, Math.min(H - 8, p.y));
    }
  }
  function draw() {
    ctx.clearRect(0, 0, W, H);
    ctx.strokeStyle = '#bbb';
    links.forEach(function (e) {
      ctx.beginPath(); ctx.moveTo(e.s.x, e.s.y);
      ctx.lineTo(e.t.x, e.t.y); ctx.stroke();
    });
    nodes.forEach(function (p) {
      ctx.beginPath();
      ctx.fillStyle = cmap[p.d['function']] || __PBR_FALLBACK__;
      ctx.arc(p.x, p.y, 6, 0, 2 * Math.PI); ctx.fill();
    });
  }
  var ticks = 0;
  (function loop() {
    step(); draw();
    if (++ticks < 150) { requestAnimationFrame(loop); }
  })();
  var drag = null;
  function pick(ev) {
    var r = canvas.getBoundingClientRect();
    var mx = ev.clientX - r.left, my = ev.clientY - r.top, best = null;
    nodes.forEach(function (p) {
      var dx = p.x - mx, dy = p.y - my;
      if (dx * dx + dy * dy < 100) { best = p; }
    });
    return best;
  }
  canvas.addEventListener('mousedown', function (ev) { drag = pick(ev); });
  canvas.addEventListener('mouseup', function () { drag = null; });
  canvas.addEventListener('mousemove', function (ev) {
    var r = canvas.getBoundingClientRect();
    if (drag) {
      drag.x = ev.clientX - r.left; drag.y = ev.clientY - r.top;
      draw();
    } else {
      var hit = pick(ev);
      canvas.title = hit ? hit.d.bel : '';
    }
  });
})();
"""


def build_graph_context(
    graph, color_map: Optional[Mapping[str, str]] = None,
) -> Mapping:
    """Template context with the SAME keys as the reference
    (``io/jupyter/visualization.py:30-45``): ``json``, ``cmap``,
    ``number_nodes``, ``number_edges``."""
    color_map = DEFAULT_COLOR_MAP if color_map is None else dict(color_map)
    doc = to_nodelink(graph)
    return {
        "json": json.dumps(doc, sort_keys=True),
        "cmap": json.dumps(color_map, sort_keys=True),
        "number_nodes": len(doc["nodes"]),
        "number_edges": len(doc["links"]),
    }


def _script_safe(serialized_json: str) -> str:
    """Make a JSON literal safe to inline inside a ``<script>`` tag: ``</``
    becomes ``<\\/`` (a no-op escape inside JS/JSON string literals) so user
    text containing ``</script>`` cannot terminate the tag early."""
    return serialized_json.replace("</", "<\\/")


def _render_js(
    context: Mapping, width: int, height: int, host_expr: str,
) -> str:
    # Sentinel substitution: every placeholder is a __PBR_*__ token that
    # cannot collide with user data, and the graph JSON (the only
    # user-controlled payload) is inserted LAST so earlier .replace calls
    # can never rewrite lookalike tokens inside it.
    return (
        _VIS_JS
        .replace("__PBR_WIDTH__", str(int(width)))
        .replace("__PBR_HEIGHT__", str(int(height)))
        .replace("__PBR_HOST__", host_expr)
        .replace("__PBR_FALLBACK__", json.dumps(_FALLBACK_COLOR))
        .replace("__PBR_CMAP__", _script_safe(context["cmap"]))
        .replace("__PBR_GRAPH__", _script_safe(context["json"]))
    )


def to_html(
    graph,
    color_map: Optional[Mapping[str, str]] = None,
    width: int = 1000,
    height: int = 650,
) -> str:
    """Self-contained HTML visualization of a (small) graph — reference
    ``to_html`` (``io/jupyter/visualization.py:48-56``)."""
    context = build_graph_context(graph, color_map=color_map)
    js = _render_js(
        context, width, height, "document.querySelector('#graph-chart')",
    )
    return (
        "<!DOCTYPE html>\n<html lang=\"en\">\n<head>\n"
        "<meta charset=\"UTF-8\">\n<title>pybel-ray graph "
        "({n} nodes, {e} edges)</title>\n</head>\n<body>\n"
        "<div id=\"graph-chart\"></div>\n"
        "<script type=\"text/javascript\">\n{js}\n</script>\n"
        "</body>\n</html>\n"
    ).format(n=context["number_nodes"], e=context["number_edges"], js=js)


def to_html_file(graph, file, color_map=None, **kwargs) -> None:
    """Write the HTML visualization to a writable file-like."""
    print(to_html(graph, color_map=color_map, **kwargs), file=file)


def to_html_path(graph, path: str, color_map=None, **kwargs) -> None:
    """Write the HTML visualization to ``path``."""
    import os

    with open(os.path.expanduser(path), "w") as f:
        to_html_file(graph, f, color_map=color_map, **kwargs)


def to_jupyter_str(
    graph,
    width: int = 1000,
    height: int = 650,
    color_map: Optional[Mapping[str, str]] = None,
) -> str:
    """JavaScript snippet that renders the graph into the active Jupyter
    output cell (reference ``to_jupyter_str``, ``io/jupyter/inline.py``).
    Deterministic — no random element ids: the snippet appends its own
    container div to ``element`` (the cell output node) when present, else
    to ``document.body``, and the render closes over that div directly (no
    selector re-query, so repeated renders can never draw into each other's
    containers)."""
    context = build_graph_context(graph, color_map=color_map)
    render = _render_js(context, width, height, "__pbr_div")
    return (
        "(function () {\n"
        "var __pbr_host = (typeof element !== 'undefined' && element.get"
        " ? element.get(0) : document.body);\n"
        "var __pbr_div = document.createElement('div');\n"
        "__pbr_div.className = 'pybel-ray-vis';\n"
        "__pbr_host.appendChild(__pbr_div);\n"
        + render
        + "\n})();"
    )


def to_jupyter(graph, width: int = 1000, height: int = 650, color_map=None):
    """IPython display object (reference ``to_jupyter``); needs IPython."""
    try:
        from IPython.display import Javascript
    except ImportError as exc:  # pragma: no cover - no IPython in container
        raise ImportError(
            "to_jupyter requires IPython; use to_jupyter_str/to_html for "
            "the raw artifact",
        ) from exc
    return Javascript(
        to_jupyter_str(graph, width=width, height=height, color_map=color_map),
    )
