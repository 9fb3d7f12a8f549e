"""Namespace / annotation resource registry.

The reference downloads ``.belns``/``.belanno`` files over HTTP and caches
them in SQL (``/root/reference/src/pybel/manager/cache_manager.py:120-384``).
The engine instead resolves resource URLs against a **frozen registry** built
once on the driver, shipped to parse actors via ``ray.put`` (one object-store
copy, zero-copy reads in every actor) — see SURVEY.md §2.4.

The registry maps ``url -> parsed content``:

* namespace: ``{"names": {name: encoding}, "ids": {identifier: encoding},
  "id_name": {name: identifier}}``
* annotation: ``{"values": {value, ...}}``

The INI-with-``[Values]`` text format of ``.belns``/``.belanno`` files is a
public format (OpenBEL); :func:`parse_belns` / :func:`parse_belanno` parse it
so real resource files work too.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Set

__all__ = [
    "parse_belns",
    "parse_belanno",
    "ResourceRegistry",
    "ResourceError",
]


class ResourceError(Exception):
    """A resource URL could not be resolved from the registry."""


def _iter_values_section(text: str):
    """Yield raw lines of the ``[Values]`` section of a belns/belanno file."""
    in_values = False
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("["):
            in_values = line.lower() == "[values]"
            continue
        if in_values:
            yield line


def parse_belns(text: str, delimiter: str = "|") -> Dict[str, Dict[str, str]]:
    """Parse a ``.belns`` file: ``name|encoding`` lines under ``[Values]``."""
    names: Dict[str, str] = {}
    for line in _iter_values_section(text):
        if delimiter in line:
            name, _, encoding = line.partition(delimiter)
        else:
            name, encoding = line, ""
        names[name] = encoding
    return {"names": names, "ids": {}, "id_name": {}}


def parse_belanno(text: str, delimiter: str = "|") -> Dict[str, Set[str]]:
    """Parse a ``.belanno`` file: ``value|label`` lines under ``[Values]``."""
    values = set()
    for line in _iter_values_section(text):
        name, _, _label = line.partition(delimiter)
        values.add(name)
    return {"values": values}


class ResourceRegistry:
    """Frozen URL -> resource content map.

    Build once on the driver; workers hold a read-only reference.
    """

    def __init__(
        self,
        namespaces: Optional[Mapping[str, Mapping]] = None,
        annotations: Optional[Mapping[str, Mapping]] = None,
    ):
        #: url -> {"names": {name: encoding}, "ids": ..., "id_name": ...}
        self.namespaces = dict(namespaces or {})
        #: url -> {"values": set}
        self.annotations = dict(annotations or {})

    # -- construction helpers ---------------------------------------------

    def add_namespace_table(self, url: str, rows) -> None:
        """Register a namespace from (name, identifier, encoding) triples."""
        names, ids, id_name = {}, {}, {}
        for name, identifier, encoding in rows:
            names[name] = encoding
            if identifier:
                ids[identifier] = encoding
                id_name[name] = identifier
        self.namespaces[url] = {"names": names, "ids": ids, "id_name": id_name}

    def add_namespace_belns(self, url: str, text: str) -> None:
        self.namespaces[url] = parse_belns(text)

    def add_annotation_values(self, url: str, values) -> None:
        self.annotations[url] = {"values": set(values)}

    def add_annotation_belanno(self, url: str, text: str) -> None:
        self.annotations[url] = parse_belanno(text)

    # -- resolution --------------------------------------------------------

    def resolve_namespace(self, url: str) -> Mapping:
        try:
            return self.namespaces[url]
        except KeyError:
            raise ResourceError("unknown namespace resource: {}".format(url)) from None

    def resolve_annotation(self, url: str) -> Mapping:
        try:
            return self.annotations[url]
        except KeyError:
            raise ResourceError("unknown annotation resource: {}".format(url)) from None
