"""BioPAX Level-3 OWL importer (reference ``io/indra.py:151-180``).

The reference's ``from_biopax`` delegates entirely to the external
``indra`` package (whose BioPAX processor wraps a Java library); neither
is available here.  This module implements a from-scratch reader for the
public BioPAX Level-3 OWL (RDF/XML) format using stdlib ``ElementTree``,
extracting the statement subset INDRA's processor documents, and then
reuses :func:`pybel_ray.io_indra.from_indra_statements` for the
distributed graph build:

* ``Catalysis``/``Control`` of a ``BiochemicalReaction`` whose right side
  gains a ``ModificationFeature`` relative to the left becomes a
  Modification statement (controller = enz, modified participant = sub;
  the ``SequenceModificationVocabulary`` term selects the mod type, a
  ``SequenceSite`` gives the position); ``controlType`` INHIBITION uses
  the De- form.
* ``Complex`` components become Complex statements.
* Groundings come from ``UnificationXref``/``RelationshipXref`` rows on
  the entity references (hgnc / uniprot / chebi), names from
  ``displayName``/``standardName``.

OWL parsing happens on the driver (one XML document — the same place the
reference's Java bridge does it); everything after the statement list is
the distributed INDRA path.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Any, Mapping, Optional

__all__ = ["from_biopax", "biopax_to_statements"]

_BP = "{http://www.biopax.org/release/biopax-level3.owl#}"
_RDF = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"

#: SequenceModificationVocabulary term fragment -> INDRA mod_type
_MOD_TERMS = [
    ("phospho", "phosphorylation"),
    ("ubiquitin", "ubiquitination"),
    ("sumo", "sumoylation"),
    ("acetyl", "acetylation"),
    ("hydroxy", "hydroxylation"),
    ("methyl", "methylation"),
    ("glycosyl", "glycosylation"),
    ("farnesyl", "farnesylation"),
    ("geranylgeranyl", "geranylgeranylation"),
    ("palmitoyl", "palmitoylation"),
    ("myristoyl", "myristoylation"),
    ("ribosyl", "ribosylation"),
]

#: modified-residue phrases -> INDRA one-letter residue codes
_RESIDUE_TERMS = [
    ("serine", "S"), ("threonine", "T"), ("tyrosine", "Y"),
    ("lysine", "K"), ("arginine", "R"), ("histidine", "H"),
    ("cysteine", "C"), ("proline", "P"), ("aspart", "D"), ("glutam", "E"),
]


def _local_id(el_or_ref: Any) -> str:
    """rdf:ID / rdf:about / rdf:resource -> bare local identifier."""
    if isinstance(el_or_ref, str):
        ref = el_or_ref
    else:
        ref = (el_or_ref.get(_RDF + "ID") or el_or_ref.get(_RDF + "about")
               or el_or_ref.get(_RDF + "resource") or "")
    return ref.lstrip("#").rsplit("#", 1)[-1]


class _Model:
    """Indexed view of one BioPAX OWL document."""

    def __init__(self, root: ET.Element):
        self.by_id: dict[str, ET.Element] = {}
        for el in root.iter():
            ident = el.get(_RDF + "ID") or el.get(_RDF + "about")
            if ident:
                self.by_id[_local_id(ident)] = el

    def resolve(self, parent: ET.Element, prop: str) -> list[ET.Element]:
        """Child elements for ``prop``, following rdf:resource refs."""
        out = []
        for child in parent.findall(_BP + prop):
            res = child.get(_RDF + "resource")
            if res is not None:
                target = self.by_id.get(_local_id(res))
                if target is not None:
                    out.append(target)
            else:
                # inline anonymous node: the single element child
                inline = list(child)
                out.extend(inline if inline else [child])
        return out

    def text(self, parent: ET.Element, prop: str) -> Optional[str]:
        el = parent.find(_BP + prop)
        return el.text if el is not None and el.text else None

    def tag(self, el: ET.Element) -> str:
        return el.tag.rsplit("}", 1)[-1]


def _agent_of(model: _Model, entity: ET.Element) -> Optional[dict]:
    """PhysicalEntity -> INDRA Agent JSON (name + db_refs)."""
    # the entity REFERENCE name is state-independent (a phosphorylated
    # Protein's displayName is often "X-P"); prefer it for the agent name
    name = None
    db_refs: dict[str, str] = {}
    refs = model.resolve(entity, "entityReference")
    for ref in refs:
        name = name or (model.text(ref, "displayName")
                        or model.text(ref, "standardName"))
        for xref in model.resolve(ref, "xref"):
            db = (model.text(xref, "db") or "").lower()
            ident = model.text(xref, "id")
            if not ident:
                continue
            if db in ("hgnc", "hgnc symbol"):
                if ident.upper().startswith("HGNC:"):
                    ident = ident[5:]
                if ident.isdigit():
                    db_refs.setdefault("HGNC", ident)
                else:
                    name = name or ident
            elif db.startswith("uniprot"):
                db_refs.setdefault("UP", ident)
            elif db == "chebi":
                db_refs.setdefault("CHEBI", ident)
            elif db == "mesh":
                db_refs.setdefault("MESH", ident)
    name = name or (model.text(entity, "displayName")
                    or model.text(entity, "standardName")
                    or model.text(entity, "name"))
    if name is None and not db_refs:
        return None
    return {"name": name, "db_refs": db_refs}


def _mods_of(model: _Model, entity: ET.Element) -> list[dict]:
    """ModificationFeature children -> INDRA ModCondition JSONs."""
    mods = []
    for feat in model.resolve(entity, "feature"):
        if model.tag(feat) != "ModificationFeature":
            continue
        term = ""
        for voc in model.resolve(feat, "modificationType"):
            term = (model.text(voc, "term") or "").lower()
            if term:
                break
        mod_type = next(
            (mt for frag, mt in _MOD_TERMS if frag in term), None,
        )
        if mod_type is None:
            continue
        mod: dict = {"mod_type": mod_type, "is_modified": True}
        residue = next(
            (code for frag, code in _RESIDUE_TERMS if frag in term), None,
        )
        if residue:
            mod["residue"] = residue
        for loc in model.resolve(feat, "featureLocation"):
            pos = model.text(loc, "sequencePosition")
            if pos:
                mod["position"] = pos
                break
        mods.append(mod)
    return mods


def _entity_key(model: _Model, entity: ET.Element) -> Optional[str]:
    """Grouping key: the entity reference id (same protein, any state)."""
    refs = model.resolve(entity, "entityReference")
    if refs:
        return _local_id(refs[0])
    return model.text(entity, "displayName")


def biopax_to_statements(owl_bytes_or_path) -> list[dict]:
    """Parse BioPAX L3 OWL -> list of INDRA statement JSON dicts."""
    if isinstance(owl_bytes_or_path, (bytes, bytearray)):
        root = ET.fromstring(owl_bytes_or_path)
    else:
        root = ET.parse(owl_bytes_or_path).getroot()
    model = _Model(root)
    stmts: list[dict] = []

    for el in model.by_id.values():
        tag = model.tag(el)

        if tag in ("Catalysis", "Control"):
            control_type = (model.text(el, "controlType") or "ACTIVATION").upper()
            controllers = [
                a for a in (
                    _agent_of(model, c) for c in model.resolve(el, "controller")
                ) if a is not None
            ]
            for reaction in model.resolve(el, "controlled"):
                if model.tag(reaction) != "BiochemicalReaction":
                    continue
                lefts = {
                    k: e for e in model.resolve(reaction, "left")
                    if (k := _entity_key(model, e)) is not None
                }
                for right in model.resolve(reaction, "right"):
                    key = _entity_key(model, right)
                    left = lefts.get(key)
                    if left is None:
                        continue
                    left_mods = {
                        (m["mod_type"], m.get("residue"), m.get("position"))
                        for m in _mods_of(model, left)
                    }
                    gained = [
                        m for m in _mods_of(model, right)
                        if (m["mod_type"], m.get("residue"), m.get("position"))
                        not in left_mods
                    ]
                    sub = _agent_of(model, right)
                    if sub is None:
                        continue
                    for mod in gained:
                        stmt_type = mod["mod_type"]
                        stmt_type = (stmt_type[0].upper() + stmt_type[1:]
                                     if control_type != "INHIBITION"
                                     else "De" + stmt_type)
                        for controller in controllers:
                            stmt = {
                                "type": stmt_type,
                                "enz": controller,
                                "sub": sub,
                                "evidence": [],
                            }
                            if "residue" in mod:
                                stmt["residue"] = mod["residue"]
                            if "position" in mod:
                                stmt["position"] = mod["position"]
                            stmts.append(stmt)

        elif tag == "Complex":
            members = [
                a for a in (
                    _agent_of(model, c)
                    for c in model.resolve(el, "component")
                ) if a is not None
            ]
            if len(members) >= 2:
                stmts.append({"type": "Complex", "members": members,
                              "evidence": []})

    return stmts


def from_biopax(owl_bytes_or_path, **kwargs):
    """BioPAX L3 OWL -> engine Graph (driver-side XML parse, then the
    distributed INDRA statement path)."""
    from .io_indra import from_indra_statements

    return from_indra_statements(
        biopax_to_statements(owl_bytes_or_path),
        name=kwargs.pop("name", "BioPAX"), **kwargs,
    )
