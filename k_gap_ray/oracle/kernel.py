"""Deterministic text-extraction + OIE + NER + entity-link kernels.

The reference delegates NLP-free RDF ingestion to upstream tools; our
driver contract (BASELINE.json north_star) requires boilerplate-stripped
text extraction that is byte-identical per url, OIE-style triple
extraction, NER mention detection and entity-link scoring. trafilatura
and spaCy are not installed in this sandbox (SURVEY.md section 7.5.2),
so the extractor is a deterministic rule-based pipeline and the OIE /
NER kernel is a compiled-regex + gazetteer system. The interfaces are
model-shaped (stateful, batched) so real models can be slotted into the
same actor pool later.

Everything here is a pure function of its inputs — no locale, no time,
no ``hash()`` (PYTHONHASHSEED-dependent), no global RNG.
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import NamedTuple

# --------------------------------------------------------------------------
# Gazetteer: canonical entity -> NER type -> surface variants.
# Variants deliberately include case/spacing/abbreviation/typo forms of the
# same entity (FIXTURES.md F1) so that canonicalization has real work to do.
# Entity 0 is the Zipf head entity (skew fixture for salted groupby).
# --------------------------------------------------------------------------
GAZETTEER: list[tuple[str, str, list[str]]] = [
    ("marine-institute", "ORG", [
        "Marine Institute", "marine institute", "Marine  Institute",
        "The Marine Institute", "Marine Institutte",
    ]),
    ("ocean-observatory", "ORG", [
        "Ocean Observatory", "ocean observatory", "Ocean  Observatory",
        "The Ocean Observatory",
    ]),
    ("coastal-research-center", "ORG", [
        "Coastal Research Center", "coastal research center",
        "Coastal Research Centre", "Coastal  Research Center",
    ]),
    ("european-science-fund", "ORG", [
        "European Science Fund", "european science fund",
        "The European Science Fund", "European Sciense Fund",
    ]),
    ("flanders-bay", "LOC", [
        "Flanders Bay", "flanders bay", "Flanders  Bay",
    ]),
    ("north-atlantic-gyre", "LOC", [
        "North Atlantic Gyre", "north atlantic gyre", "North  Atlantic Gyre",
    ]),
    ("baltic-shelf", "LOC", [
        "Baltic Shelf", "baltic shelf", "The Baltic Shelf",
    ]),
    ("professor-vandamme", "PER", [
        "Professor Vandamme", "professor vandamme", "Prof. Vandamme",
    ]),
    ("doctor-okafor", "PER", [
        "Doctor Okafor", "doctor okafor", "Dr. Okafor",
    ]),
    ("captain-lindqvist", "PER", [
        "Captain Lindqvist", "captain lindqvist", "Capt. Lindqvist",
    ]),
    ("rv-belgica", "VEH", [
        "RV Belgica", "rv belgica", "R/V Belgica",
    ]),
    ("rv-simon-stevin", "VEH", [
        "RV Simon Stevin", "rv simon stevin", "R/V Simon Stevin",
    ]),
    ("plankton-bloom-survey", "PRJ", [
        "Plankton Bloom Survey", "plankton bloom survey",
        "The Plankton Bloom Survey",
    ]),
    ("seabed-mapping-project", "PRJ", [
        "Seabed Mapping Project", "seabed mapping project",
        "Seabed  Mapping Project",
    ]),
    ("tidal-energy-consortium", "ORG", [
        "Tidal Energy Consortium", "tidal energy consortium",
        "The Tidal Energy Consortium",
    ]),
    ("deepwater-sensor-array", "DEV", [
        "Deepwater Sensor Array", "deepwater sensor array",
        "Deepwater  Sensor Array",
    ]),
    ("benthic-lab", "ORG", [
        "Benthic Lab", "benthic lab", "The Benthic Lab",
    ]),
    ("gulf-stream-station", "LOC", [
        "Gulf Stream Station", "gulf stream station",
    ]),
    ("argo-float-network", "DEV", [
        "Argo Float Network", "argo float network", "Argo  Float Network",
    ]),
    ("blue-carbon-initiative", "PRJ", [
        "Blue Carbon Initiative", "blue carbon initiative",
        "The Blue Carbon Initiative",
    ]),
]

# Verb phrase -> predicate IRI (entity-object triples).
VERB_MAP: dict[str, str] = {
    "is located in": "urn:kgap:pred:locatedIn",
    "collaborates with": "urn:kgap:pred:collaboratesWith",
    "funds": "urn:kgap:pred:funds",
    "operates": "urn:kgap:pred:operates",
    "studies": "urn:kgap:pred:studies",
    "partners with": "urn:kgap:pred:partnersWith",
    "monitors": "urn:kgap:pred:monitors",
    "manages": "urn:kgap:pred:manages",
    "deploys": "urn:kgap:pred:deploys",
    "coordinates": "urn:kgap:pred:coordinates",
}

# Verb phrase -> (predicate IRI, literal datatype) for literal-object triples.
LITERAL_VERB_MAP: dict[str, tuple[str, str]] = {
    "was founded in": ("urn:kgap:pred:foundedIn", "http://www.w3.org/2001/XMLSchema#gYear"),
    "employs": ("urn:kgap:pred:employs", "http://www.w3.org/2001/XMLSchema#integer"),
}

_WS_RE = re.compile(r"\s+")


def norm_surface(s: str) -> str:
    """Casefold + collapse whitespace + strip edge punctuation.

    This is the canonicalization key (M7 in SURVEY.md section 2.2 — the
    reference normalizes labels with CONCAT/translation feeds,
    /root/reference/docs/advanced-topics.md:368).
    """
    return _WS_RE.sub(" ", s.strip().strip(".,;:").casefold()).strip()


# norm surface -> (canonical gazetteer id, ner_type). Built once at import.
ALIASES: dict[str, tuple[str, str]] = {}
for _eid, _typ, _forms in GAZETTEER:
    for _f in _forms:
        ALIASES[norm_surface(_f)] = (_eid, _typ)


# --------------------------------------------------------------------------
# HTML -> text extraction (M10). Deterministic boilerplate stripping:
# keep only <p>...</p> bodies inside the page, drop nav/footer/title,
# unescape entities, join paragraphs with "\n". Byte-identical per url
# by construction (pure function of the html bytes).
# --------------------------------------------------------------------------
_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text(html_bytes: bytes) -> str:
    paras = _P_RE.findall(html_bytes)
    out = []
    for p in paras:
        s = p.decode("utf-8", errors="replace")
        s = _TAG_RE.sub("", s)
        out.append(_htmllib.unescape(s))
    return "\n".join(out)


# --------------------------------------------------------------------------
# OIE-style triple extraction + NER mentions (T3/T4 kernels).
# --------------------------------------------------------------------------
class Mention(NamedTuple):
    surface: str
    norm: str
    start: int
    end: int
    ner_type: str
    cand_entity: str
    link_score: float


class RawTriple(NamedTuple):
    subj: str          # surface form (pre-canonicalization)
    pred: str          # predicate IRI
    obj: str           # surface form or literal lexical value
    obj_is_literal: bool
    obj_datatype: str | None


def _verb_pattern() -> re.Pattern[str]:
    verbs = sorted(list(VERB_MAP) + list(LITERAL_VERB_MAP), key=len, reverse=True)
    alt = "|".join(re.escape(v) for v in verbs)
    return re.compile(rf"^(.*?)\s+({alt})\s+(.*?)\.?$")


_SENT_RE = _verb_pattern()
_NUM_RE = re.compile(r"^\d+$")


def extract_from_text(text: str) -> tuple[list[RawTriple], list[Mention]]:
    """Parse clean text into OIE triples + gazetteer-validated mentions.

    Sentences are newline-separated paragraphs of the form
    "<subject> <verb phrase> <object>." — the generic OIE pattern. A
    subject/object span is a mention only if its normalized form is in
    the gazetteer alias table (precision guard); the triple is emitted
    when the subject links and the object either links or is a literal.
    """
    triples: list[RawTriple] = []
    mentions: list[Mention] = []
    offset = 0
    for sent in text.split("\n"):
        m = _SENT_RE.match(sent)
        if m:
            s_surf, verb, o_surf = m.group(1), m.group(2), m.group(3)
            s_norm = norm_surface(s_surf)
            s_hit = ALIASES.get(s_norm)
            if s_hit is not None:
                s_start = offset + m.start(1)
                mentions.append(Mention(s_surf, s_norm, s_start,
                                        s_start + len(s_surf), s_hit[1],
                                        s_hit[0], 1.0))
            if verb in LITERAL_VERB_MAP:
                pred, dtype = LITERAL_VERB_MAP[verb]
                if s_hit is not None and _NUM_RE.match(o_surf):
                    triples.append(RawTriple(s_surf, pred, o_surf, True, dtype))
            else:
                o_norm = norm_surface(o_surf)
                o_hit = ALIASES.get(o_norm)
                if o_hit is not None:
                    o_start = offset + m.start(3)
                    mentions.append(Mention(o_surf, o_norm, o_start,
                                            o_start + len(o_surf), o_hit[1],
                                            o_hit[0], 1.0))
                if s_hit is not None and o_hit is not None:
                    triples.append(RawTriple(
                        s_surf, VERB_MAP[verb], o_surf, False, None))
        offset += len(sent) + 1  # +1 for the joining "\n"
    return triples, mentions


def graph_for_url(url: str) -> str:
    """Named-graph id for a page url — the host plays the reference's
    per-feed named-graph role (urn:kgap:ldes:{feed},
    /root/reference/ldes-consumer/app.py:225)."""
    host = url.split("/")[2] if "://" in url else "unknown"
    return f"urn:kgap:web:{host}"
