"""BEL language constants.

These mirror the *public* BEL 1.0/2.0 specification surface that the reference
implementation (``/root/reference/src/pybel/constants.py``) also encodes; the
names and values here are BEL language keywords, not code copied from the
reference.  Where the reference defines a PyBEL-specific extension (e.g.
``gmod``, ``partOf``) we reproduce the same *semantics* so that emitted
triples match (see SURVEY.md §1-2).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# node dict keys
# ---------------------------------------------------------------------------
FUNCTION = "function"
CONCEPT = "concept"
NAMESPACE = "namespace"
NAME = "name"
IDENTIFIER = "identifier"
XREFS = "xref"
MEMBERS = "members"
REACTANTS = "reactants"
PRODUCTS = "products"
FUSION = "fusion"
PARTNER_3P = "partner_3p"
PARTNER_5P = "partner_5p"
RANGE_3P = "range_3p"
RANGE_5P = "range_5p"
FUSION_REFERENCE = "reference"
FUSION_START = "left"
FUSION_STOP = "right"
FUSION_MISSING = "missing"
VARIANTS = "variants"
KIND = "kind"
HGVS = "hgvs"
PMOD = "pmod"
GMOD = "gmod"
FRAGMENT = "frag"
FRAGMENT_START = "start"
FRAGMENT_STOP = "stop"
FRAGMENT_MISSING = "missing"
FRAGMENT_DESCRIPTION = "description"
PMOD_CODE = "code"
PMOD_POSITION = "pos"

#: namespace used for bare names in lenient parsing mode
DIRTY = "dirty"
#: the default BEL namespace (activities, pmod names, ...)
BEL_DEFAULT_NAMESPACE = "bel"

# ---------------------------------------------------------------------------
# node functions
# ---------------------------------------------------------------------------
ABUNDANCE = "Abundance"
GENE = "Gene"
RNA = "RNA"
MIRNA = "miRNA"
PROTEIN = "Protein"
BIOPROCESS = "BiologicalProcess"
PATHOLOGY = "Pathology"
POPULATION = "Population"
COMPOSITE = "Composite"
COMPLEX = "Complex"
REACTION = "Reaction"

PYBEL_NODE_FUNCTIONS = {
    ABUNDANCE, GENE, RNA, MIRNA, PROTEIN, BIOPROCESS, PATHOLOGY,
    COMPOSITE, COMPLEX, REACTION, POPULATION,
}

#: function constant -> canonical BEL function label used in serialization
REV_ABUNDANCE_LABELS = {
    ABUNDANCE: "a",
    GENE: "g",
    MIRNA: "m",
    PROTEIN: "p",
    RNA: "r",
    BIOPROCESS: "bp",
    PATHOLOGY: "path",
    COMPLEX: "complex",
    COMPOSITE: "composite",
    POPULATION: "pop",
}

#: BEL term tag -> function constant (both short and long forms)
ABUNDANCE_LABELS = {
    "abundance": ABUNDANCE, "a": ABUNDANCE,
    "geneAbundance": GENE, "g": GENE,
    "microRNAAbundance": MIRNA, "m": MIRNA,
    "proteinAbundance": PROTEIN, "p": PROTEIN,
    "rnaAbundance": RNA, "r": RNA,
    "biologicalProcess": BIOPROCESS, "bp": BIOPROCESS,
    "pathology": PATHOLOGY, "path": PATHOLOGY, "o": PATHOLOGY,
    "composite": COMPOSITE, "compositeAbundance": COMPOSITE,
    "complex": COMPLEX, "complexAbundance": COMPLEX,
    "populationAbundance": POPULATION, "pop": POPULATION,
}

# ---------------------------------------------------------------------------
# edge dict keys
# ---------------------------------------------------------------------------
RELATION = "relation"
CITATION = "citation"
EVIDENCE = "evidence"
ANNOTATIONS = "annotations"
SUBJECT = "subject"
OBJECT = "object"
LINE = "line"
HASH = "hash"

CITATION_DB = "db"
CITATION_IDENTIFIER = "db_id"

CITATION_TYPE_PUBMED = "PubMed"
CITATION_TYPES = {
    "Book", "PubMed", "PubMed Central", "Journal",
    "Online Resource", "URL", "DOI", "Other",
}

# modifier keys
MODIFIER = "modifier"
EFFECT = "effect"
TARGET = "target"
FROM_LOC = "fromLoc"
TO_LOC = "toLoc"
LOCATION = "location"

ACTIVITY = "Activity"
DEGRADATION = "Degradation"
TRANSLOCATION = "Translocation"
CELL_SECRETION = "CellSecretion"
CELL_SURFACE_EXPRESSION = "CellSurfaceExpression"

INTRACELLULAR = "intracellular"
EXTRACELLULAR = "extracellular space"
CELL_SURFACE = "cell surface"

# ---------------------------------------------------------------------------
# relations
# ---------------------------------------------------------------------------
HAS_REACTANT = "hasReactant"
HAS_PRODUCT = "hasProduct"
HAS_VARIANT = "hasVariant"
TRANSCRIBED_TO = "transcribedTo"
TRANSLATED_TO = "translatedTo"
INCREASES = "increases"
DIRECTLY_INCREASES = "directlyIncreases"
DECREASES = "decreases"
DIRECTLY_DECREASES = "directlyDecreases"
CAUSES_NO_CHANGE = "causesNoChange"
REGULATES = "regulates"
BINDS = "binds"
CORRELATION = "correlation"
NO_CORRELATION = "noCorrelation"
NEGATIVE_CORRELATION = "negativeCorrelation"
POSITIVE_CORRELATION = "positiveCorrelation"
ASSOCIATION = "association"
ORTHOLOGOUS = "orthologous"
ANALOGOUS_TO = "analogousTo"
IS_A = "isA"
RATE_LIMITING_STEP_OF = "rateLimitingStepOf"
SUBPROCESS_OF = "subProcessOf"
BIOMARKER_FOR = "biomarkerFor"
PROGNOSTIC_BIOMARKER_FOR = "prognosticBiomarkerFor"
EQUIVALENT_TO = "equivalentTo"
PART_OF = "partOf"
HAS_MEMBER = "hasMember"
HAS_MEMBERS = "hasMembers"
HAS_COMPONENT = "hasComponent"
HAS_COMPONENTS = "hasComponents"

CAUSAL_INCREASE_RELATIONS = {INCREASES, DIRECTLY_INCREASES}
CAUSAL_DECREASE_RELATIONS = {DECREASES, DIRECTLY_DECREASES}
DIRECT_CAUSAL_RELATIONS = {DIRECTLY_DECREASES, DIRECTLY_INCREASES}
CAUSAL_POLAR_RELATIONS = CAUSAL_INCREASE_RELATIONS | CAUSAL_DECREASE_RELATIONS
CAUSAL_RELATIONS = CAUSAL_POLAR_RELATIONS | {REGULATES}

APOLAR_CORRELATIVE_RELATIONS = {CORRELATION, NO_CORRELATION}
POLAR_CORRELATIVE_RELATIONS = {POSITIVE_CORRELATION, NEGATIVE_CORRELATION}
CORRELATIVE_RELATIONS = APOLAR_CORRELATIVE_RELATIONS | POLAR_CORRELATIVE_RELATIONS
POLAR_RELATIONS = CAUSAL_POLAR_RELATIONS | POLAR_CORRELATIVE_RELATIONS

#: relations that are materialized twice, once per direction
TWO_WAY_RELATIONS = CORRELATIVE_RELATIONS | {
    ASSOCIATION, ORTHOLOGOUS, ANALOGOUS_TO, EQUIVALENT_TO, BINDS,
}

#: relations that do not require citation/evidence (structural auto-edges)
UNQUALIFIED_EDGES = {
    HAS_REACTANT, HAS_PRODUCT, HAS_VARIANT, TRANSCRIBED_TO, TRANSLATED_TO,
    IS_A, EQUIVALENT_TO, PART_OF, ORTHOLOGOUS,
}

#: relation tag (symbol or keyword) -> canonical relation, for bel-to-bel
#: relations (reference grammar: parse_bel.py:144-232,509-528)
BEL_TO_BEL_RELATION_TAGS = {
    "->": INCREASES, "→": INCREASES, "increases": INCREASES,
    "=>": DIRECTLY_INCREASES, "⇒": DIRECTLY_INCREASES,
    "directlyIncreases": DIRECTLY_INCREASES,
    "-|": DECREASES, "decreases": DECREASES,
    "=|": DIRECTLY_DECREASES, "directlyDecreases": DIRECTLY_DECREASES,
    "cnc": CAUSES_NO_CHANGE, "causesNoChange": CAUSES_NO_CHANGE,
    "reg": REGULATES, "regulates": REGULATES,
    "binds": BINDS,
    "cor": CORRELATION, "correlation": CORRELATION,
    "noCor": NO_CORRELATION, "noCorrelation": NO_CORRELATION,
    "neg": NEGATIVE_CORRELATION, "negativeCorrelation": NEGATIVE_CORRELATION,
    "pos": POSITIVE_CORRELATION, "positiveCorrelation": POSITIVE_CORRELATION,
    "--": ASSOCIATION, "association": ASSOCIATION,
    "orthologous": ORTHOLOGOUS,
    "isA": IS_A,
    "eq": EQUIVALENT_TO, "equivalentTo": EQUIVALENT_TO,
    "partOf": PART_OF,
    "analogousTo": ANALOGOUS_TO,
}

#: causal relation tags usable in nested statements
CAUSAL_RELATION_TAGS = {
    "->": INCREASES, "→": INCREASES, "increases": INCREASES,
    "=>": DIRECTLY_INCREASES, "⇒": DIRECTLY_INCREASES,
    "directlyIncreases": DIRECTLY_INCREASES,
    "-|": DECREASES, "decreases": DECREASES,
    "=|": DIRECTLY_DECREASES, "directlyDecreases": DIRECTLY_DECREASES,
}

#: mixed-relation tags handled outside the generic bel-to-bel production
MIXED_RELATION_TAGS = {
    "rateLimitingStepOf": RATE_LIMITING_STEP_OF,
    "subProcessOf": SUBPROCESS_OF,
    ":>": TRANSCRIBED_TO, "transcribedTo": TRANSCRIBED_TO,
    ">>": TRANSLATED_TO, "translatedTo": TRANSLATED_TO,
    "biomarkerFor": BIOMARKER_FOR,
    "prognosticBiomarkerFor": PROGNOSTIC_BIOMARKER_FOR,
    "hasMember": HAS_MEMBER,
    "hasMembers": HAS_MEMBERS,
    "hasComponent": HAS_COMPONENT,
    "hasComponents": HAS_COMPONENTS,
    "hasVariant": HAS_VARIANT,
    "hasReactant": HAS_REACTANT,
    "hasProduct": HAS_PRODUCT,
}

ALL_RELATION_TAGS = {**BEL_TO_BEL_RELATION_TAGS, **MIXED_RELATION_TAGS}

# ---------------------------------------------------------------------------
# BEL keywords (control/metadata records)
# ---------------------------------------------------------------------------
BEL_KEYWORD_SET = "SET"
BEL_KEYWORD_DOCUMENT = "DOCUMENT"
BEL_KEYWORD_DEFINE = "DEFINE"
BEL_KEYWORD_NAMESPACE = "NAMESPACE"
BEL_KEYWORD_ANNOTATION = "ANNOTATION"
BEL_KEYWORD_AS = "AS"
BEL_KEYWORD_URL = "URL"
BEL_KEYWORD_LIST = "LIST"
BEL_KEYWORD_PATTERN = "PATTERN"
BEL_KEYWORD_UNSET = "UNSET"
BEL_KEYWORD_STATEMENT_GROUP = "STATEMENT_GROUP"
BEL_KEYWORD_CITATION = "Citation"
BEL_KEYWORD_EVIDENCE = "Evidence"
BEL_KEYWORD_SUPPORT = "SupportingText"
BEL_KEYWORD_ALL = "ALL"

#: document metadata keys: BEL keyword -> internal key
DOCUMENT_KEYS = {
    "Authors": "authors",
    "ContactInfo": "contact",
    "Copyright": "copyright",
    "Description": "description",
    "Disclaimer": "disclaimer",
    "Licenses": "licenses",
    "Name": "name",
    "Version": "version",
    "Project": "project",
}
INVERSE_DOCUMENT_KEYS = {v: k for k, v in DOCUMENT_KEYS.items()}
REQUIRED_METADATA = {"name", "version", "description", "authors", "contact"}

# ---------------------------------------------------------------------------
# namespace encodings (public BEL namespace encoding letters)
# ---------------------------------------------------------------------------
BELNS_ENCODINGS = {
    "G": {GENE},
    "R": {RNA, MIRNA},
    "P": {PROTEIN},
    "M": {MIRNA},
    "A": {ABUNDANCE, RNA, MIRNA, PROTEIN, GENE, COMPLEX},
    "B": {PATHOLOGY, BIOPROCESS},
    "O": {PATHOLOGY},
    "C": {COMPLEX},
}

# ---------------------------------------------------------------------------
# activities (BEL 1.0 names -> BEL 2.0 short labels)
# ---------------------------------------------------------------------------
ACTIVITY_LABELS = {
    "catalyticActivity": "cat", "cat": "cat",
    "chaperoneActivity": "chap", "chap": "chap",
    "gtpBoundActivity": "gtp", "gtp": "gtp",
    "kinaseActivity": "kin", "kin": "kin",
    "peptidaseActivity": "pep", "pep": "pep",
    "phosphataseActivity": "phos", "phos": "phos",
    "ribosylationActivity": "ribo", "ribo": "ribo",
    "transcriptionalActivity": "tscript", "tscript": "tscript",
    "transportActivity": "tport", "tport": "tport",
    "molecularActivity": "molecularActivity",
    "guanineNucleotideExchangeFactorActivity": "gef", "gef": "gef",
    "gtpaseActivatingProteinActivity": "gap", "gap": "gap",
}

# ---------------------------------------------------------------------------
# default-namespace protein / gene modifications
# ---------------------------------------------------------------------------
PMOD_NAMESPACE = {
    "Ac": "Ac", "acetylation": "Ac",
    "ADPRib": "ADPRib", "ADP-ribosylation": "ADPRib",
    "adenosine diphosphoribosyl": "ADPRib",
    "Farn": "Farn", "farnesylation": "Farn",
    "Gerger": "Gerger", "geranylgeranylation": "Gerger",
    "Glyco": "Glyco", "glycosylation": "Glyco",
    "Hy": "Hy", "hydroxylation": "Hy",
    "ISG": "ISG", "ISGylation": "ISG", "ISG15-protein conjugation": "ISG",
    "Me": "Me", "methylation": "Me",
    "Me1": "Me1", "monomethylation": "Me1", "mono-methylation": "Me1",
    "Me2": "Me2", "dimethylation": "Me2", "di-methylation": "Me2",
    "Me3": "Me3", "trimethylation": "Me3", "tri-methylation": "Me3",
    "Myr": "Myr", "myristoylation": "Myr",
    "Nedd": "Nedd", "neddylation": "Nedd",
    "NGlyco": "NGlyco", "N-linked glycosylation": "NGlyco",
    "NO": "NO", "Nitrosylation": "NO",
    "OGlyco": "OGlyco", "O-linked glycosylation": "OGlyco",
    "Palm": "Palm", "palmitoylation": "Palm",
    "Ph": "Ph", "phosphorylation": "Ph",
    "Sulf": "Sulf", "sulfation": "Sulf", "sulphation": "Sulf",
    "sulfur addition": "Sulf", "sulphur addition": "Sulf",
    "sulfonation": "sulfonation", "sulphonation": "sulfonation",
    "Sumo": "Sumo", "SUMOylation": "Sumo",
    "Ub": "Ub", "ubiquitination": "Ub", "ubiquitinylation": "Ub",
    "ubiquitylation": "Ub",
    "UbK48": "UbK48", "Lysine 48-linked polyubiquitination": "UbK48",
    "UbK63": "UbK63", "Lysine 63-linked polyubiquitination": "UbK63",
    "UbMono": "UbMono", "monoubiquitination": "UbMono",
    "UbPoly": "UbPoly", "polyubiquitination": "UbPoly",
    "Ox": "Ox", "oxidation": "Ox",
}

#: legacy BEL 1.0 single-letter pmod codes -> BEL 2.0 names
PMOD_LEGACY_LABELS = {
    "P": "Ph", "A": "Ac", "F": "Farn", "G": "Glyco", "H": "Hy",
    "M": "Me", "R": "ADPRib", "S": "Sumo", "U": "Ub", "O": "Ox",
}

GMOD_NAMESPACE = {
    "methylation": "Me", "Me": "Me", "M": "Me", "ADPRib": "ADPRib",
}

AMINO_ACIDS = {
    "A": "Ala", "R": "Arg", "N": "Asn", "D": "Asp", "C": "Cys",
    "E": "Glu", "Q": "Gln", "G": "Gly", "H": "His", "I": "Ile",
    "L": "Leu", "K": "Lys", "M": "Met", "F": "Phe", "P": "Pro",
    "S": "Ser", "T": "Thr", "W": "Trp", "Y": "Tyr", "V": "Val",
}
AMINO_ACID_TRIPLES = set(AMINO_ACIDS.values())

DNA_NUCLEOTIDES = {"A", "T", "C", "G"}
