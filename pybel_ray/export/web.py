"""BEL-Commons-style network upload / download with injectable transport.

Mirrors the reference's ``to_web`` / ``from_web`` (io/web.py:52-130):
``to_web`` POSTs the node-link JSON document to ``<host>/api/receive/``
with basic auth + the public flag header; ``from_web`` GETs a network's
node-link export and rebuilds a :class:`Graph`.  Host / user / password
resolve from arguments first, then the ``PYBEL_REMOTE_HOST`` /
``PYBEL_REMOTE_USER`` / ``PYBEL_REMOTE_PASSWORD`` environment variables
(the reference's config keys).

The HTTP call is an injectable ``transport`` callable (same pattern as
:mod:`pybel_ray.enrichment`'s PubMed fetcher) so the path is fully
testable offline; the default transport uses :mod:`urllib` and is only
exercised against a live server.

Note these are driver-side parity conveniences operating on the
node-link document (small-graph path); the canonical big-graph exchange
format remains the Parquet node/edge tables.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING, Optional

if TYPE_CHECKING:  # pragma: no cover
    from ..struct.graph import Graph

__all__ = ["to_web", "from_web", "RECEIVE_ENDPOINT", "GET_ENDPOINT"]

RECEIVE_ENDPOINT = "/api/receive/"
GET_ENDPOINT = "/api/network/{}/export/nodelink"


def _default_post(url: str, payload: bytes, headers: dict) -> bytes:  # pragma: no cover - needs network
    from urllib.request import Request, urlopen

    req = Request(url, data=payload, headers=headers, method="POST")
    with urlopen(req, timeout=30) as resp:
        return resp.read()


def _default_get(url: str) -> bytes:  # pragma: no cover - needs network
    from urllib.request import urlopen

    with urlopen(url, timeout=30) as resp:
        return resp.read()


def to_web(
    graph: "Graph",
    host: Optional[str] = None,
    user: Optional[str] = None,
    password: Optional[str] = None,
    public: bool = False,
    transport=None,
) -> bytes:
    """POST the node-link document to the receiver service; returns the
    raw response body (reference io/web.py:52-101 returns the requests
    response — the body is the transport-neutral equivalent)."""
    import base64

    from .nodelink import to_nodelink

    host = host or os.environ.get("PYBEL_REMOTE_HOST")
    if not host:
        raise ValueError("no host given and PYBEL_REMOTE_HOST unset")
    user = user or os.environ.get("PYBEL_REMOTE_USER")
    if user is None:
        raise ValueError("no user found")
    password = password or os.environ.get("PYBEL_REMOTE_PASSWORD")
    if password is None:
        raise ValueError("no password found")

    url = host.rstrip("/") + RECEIVE_ENDPOINT
    payload = json.dumps(to_nodelink(graph), sort_keys=True).encode("utf8")
    token = base64.b64encode("{}:{}".format(user, password).encode("utf8"))
    headers = {
        "content-type": "application/json",
        "bel-commons-public": "true" if public else "false",
        "authorization": "Basic " + token.decode("ascii"),
    }
    transport = transport or _default_post
    return transport(url, payload, headers)


def from_web(network_id: int, host: Optional[str] = None, transport=None) -> "Graph":
    """GET a network's node-link export and rebuild a Graph
    (reference io/web.py:104-130)."""
    from .nodelink import from_nodelink

    host = host or os.environ.get("PYBEL_REMOTE_HOST")
    if not host:
        raise ValueError("no host given and PYBEL_REMOTE_HOST unset")
    url = host.rstrip("/") + GET_ENDPOINT.format(network_id)
    transport = transport or _default_get
    return from_nodelink(json.loads(transport(url)))
