"""Answer citation-block extraction — pure-Python core.

Transcribed from the reference's evaluator preprocessing
(/root/reference/evaluator/preprocessing/reference_extractor.py:1-359):
an agent answer ends with a 引用数据 block naming the entity /
relationship / chunk / report ids the answer cites; the evaluator's
retrieval metrics key off those ids. The extraction is a ladder:

  1. gate: no "引用数据" substring anywhere → empty result (:24-26);
  2. section: 7 ordered regex patterns locate the trailing {...}
     (#/##/###/#### heading, 引用数据:/引用:/参考:/数据: prefixes,
     <引用数据> tags, bare {..data..}) (:104-121);
  3. JSON parse ladder: as-is → single-quote repair → data-field
     re-wrap → ASCII-clean + key-quoting (:126-166);
  4. parsed extraction per family with the reference's exact key
     ladders (Entities/entities/Entity/entity; Relationships +
     Relations + Report keys — reports feed relationships TOO, a
     reference quirk kept; Chunks/chunk/TextChunks; Reports),
     handling list / comma-string / dict / {id:} item shapes
     (:168-310);
  5. text fallback when no rung of the JSON ladder parses: field
     regexes + digit (or quoted-string, for chunks) harvest
     (:312-359);
  6. id cleanup for entities/relationships (validate_and_format_ids
     :73-102: drop None/blank, numbers → str(int), keep the rest).

Deviation (documented): the reference dedups with ``list(set(...))``
— Python-set order, nondeterministic across runs; here dedup is
``sorted(set(...))`` so distributed runs and the SQL oracle agree.
Consumers treat the lists as sets (evaluator/metrics), so only the
ordering differs.
"""

from __future__ import annotations

import json
import re

_EMPTY: dict[str, list[str]] = {
    "entities": [],
    "relationships": [],
    "chunks": [],
    "reports": [],
}

# extract_reference_section patterns, in reference order (:106-114)
_SECTION_PATTERNS = [
    r"#{1,4}\s*引用数据[\s\S]*?(\{[\s\S]*?\})\s*$",
    r"引用数据[：:]\s*(\{[\s\S]*?\})\s*$",
    r"<引用数据>\s*(\{[\s\S]*?\})\s*</引用数据>",
    r"引用[：:]\s*(\{[\s\S]*?\})\s*$",
    r"参考[：:]\s*(\{[\s\S]*?\})\s*$",
    r"数据[：:]\s*(\{[\s\S]*?\})\s*$",
    r"(\{[\s\S]*?['\"]*data['\"]*[\s\S]*?\})\s*$",
]

_ENTITY_KEYS = ["Entities", "entities", "Entity", "entity"]
# reference quirk: Report keys feed the relationships list too (:229-232)
_REL_KEYS = [
    "Relationships", "relationships", "Relations", "relations",
    "Relation", "relation", "Reports", "reports", "Report", "report",
]
_CHUNK_KEYS = ["Chunks", "chunks", "Chunk", "chunk", "TextChunks", "textchunks"]
_REPORT_KEYS = ["Reports", "reports", "Report", "report"]


def extract_reference_section(answer: str) -> str:
    """:104-121 — first matching pattern wins, group(1) stripped."""
    for pattern in _SECTION_PATTERNS:
        match = re.search(pattern, answer, re.DOTALL)
        if match:
            return match.group(1).strip()
    return ""


def parse_json_data(data_text: str):
    """:126-166 — four-rung JSON repair ladder, None when all fail."""
    try:
        return json.loads(data_text)
    except Exception:
        pass
    try:
        return json.loads(data_text.replace("'", '"'))
    except Exception:
        pass
    try:
        data_match = re.search(
            r"\{\s*[\"']*data[\"']*\s*:\s*(\{[\s\S]*?\})\s*\}",
            data_text,
            re.DOTALL,
        )
        if data_match:
            fixed = '{"data":' + data_match.group(1).replace("'", '"') + "}"
            return json.loads(fixed)
    except Exception:
        pass
    try:
        cleaned = "".join(c for c in data_text if ord(c) < 128)
        cleaned = cleaned.replace("'", '"')
        cleaned = re.sub(r"(\w+)(?=\s*:)", r'"\1"', cleaned)
        return json.loads(cleaned)
    except Exception:
        return None


def _unwrap_data(parsed) -> dict:
    # non-dict parses (a JSON list/scalar) carry no keyed families —
    # the reference's `key in parsed` membership tests come up False
    # on them, so an empty dict reproduces the same outcome
    if not isinstance(parsed, dict):
        return {}
    if "data" in parsed and isinstance(parsed["data"], dict):
        return parsed["data"]
    return parsed


def _ids_from_keyed(parsed: dict, keys: list[str]) -> list[str]:
    """Shared list/comma-string/dict walk for the entity and
    relationship families (:168-263 — including the triple/tuple
    stringification rung on relationships, which `str(item)` covers
    for every item shape the reference names)."""
    out: list[str] = []
    data = _unwrap_data(parsed)
    for key in keys:
        if key in data and data[key]:
            val = data[key]
            if isinstance(val, list):
                for item in val:
                    if isinstance(item, bool):
                        # bool is an int subclass; the reference's
                        # isinstance(int) rung would stringify it the
                        # same way — keep parity
                        out.append(str(int(item)))
                    elif isinstance(item, (int, float)):
                        out.append(str(int(item)))
                    elif isinstance(item, str):
                        out.append(item)
                    elif isinstance(item, dict) and "id" in item:
                        out.append(str(item["id"]))
                    elif isinstance(item, tuple) or (
                        isinstance(item, list) and len(item) >= 3
                    ):
                        # the reference stringifies ANY tuple but only
                        # lists of ≥3 elements (:246); the tuple rung
                        # is unreachable via json.loads (JSON has no
                        # tuples) — kept for literal parity
                        out.append(str(item))
            elif isinstance(val, str):
                out.extend(p.strip() for p in val.split(",") if p.strip())
            elif isinstance(val, dict):
                for _k, v in val.items():
                    if isinstance(v, (int, str)):
                        out.append(str(v))
    return out


def extract_entities_from_parsed(parsed: dict) -> list[str]:
    # :168-216 — same walk minus the ≥3-tuple rung; entity items are
    # never tuples in the reference's shapes, and a tuple would fall
    # through unchanged there too
    out: list[str] = []
    data = _unwrap_data(parsed)
    for key in _ENTITY_KEYS:
        if key in data and data[key]:
            val = data[key]
            if isinstance(val, list):
                for item in val:
                    if isinstance(item, bool):
                        out.append(str(int(item)))
                    elif isinstance(item, (int, float)):
                        out.append(str(int(item)))
                    elif isinstance(item, str):
                        out.append(item)
                    elif isinstance(item, dict) and "id" in item:
                        out.append(str(item["id"]))
            elif isinstance(val, str):
                out.extend(p.strip() for p in val.split(",") if p.strip())
            elif isinstance(val, dict):
                for _k, v in val.items():
                    if isinstance(v, (int, str)):
                        out.append(str(v))
    return out


def extract_relationships_from_parsed(parsed: dict) -> list[str]:
    return _ids_from_keyed(parsed, _REL_KEYS)


def extract_chunks_from_parsed(parsed: dict) -> list[str]:
    """:265-287 — list rung keeps STRING items only; comma-string rung."""
    out: list[str] = []
    data = _unwrap_data(parsed)
    for key in _CHUNK_KEYS:
        if key in data and data[key]:
            val = data[key]
            if isinstance(val, list):
                out.extend(item for item in val if isinstance(item, str))
            elif isinstance(val, str):
                out.extend(c.strip() for c in val.split(",") if c.strip())
    return out


def extract_reports_from_parsed(parsed: dict) -> list[str]:
    """:289-310 — int-or-string list items, comma-string rung."""
    out: list[str] = []
    data = _unwrap_data(parsed)
    for key in _REPORT_KEYS:
        if key in data and data[key]:
            val = data[key]
            if isinstance(val, list):
                out.extend(
                    str(item) for item in val if isinstance(item, (int, str))
                )
            elif isinstance(val, str):
                out.extend(r.strip() for r in val.split(",") if r.strip())
    return out


def extract_entities_from_text(text: str) -> list[str]:
    """:312-323 — bracketed list or bare digit-run, digits harvested."""
    m = re.search(r"[Ee]ntities\s*[=:]\s*\[(.*?)\]", text, re.DOTALL) or re.search(
        r"[Ee]ntities\s*[=:]\s*([\d\s,]+)", text, re.DOTALL
    )
    if m:
        return re.findall(r"\d+", m.group(1).strip())
    return []


def extract_relationships_from_text(text: str) -> list[str]:
    """:325-338 — Relationships patterns, then Reports as fallback."""
    m = (
        re.search(r"[Rr]elationships\s*[=:]\s*\[(.*?)\]", text, re.DOTALL)
        or re.search(r"[Rr]elationships\s*[=:]\s*([\d\s,]+)", text, re.DOTALL)
        or re.search(r"[Rr]eports\s*[=:]\s*\[(.*?)\]", text, re.DOTALL)
        or re.search(r"[Rr]eports\s*[=:]\s*([\d\s,]+)", text, re.DOTALL)
    )
    if m:
        return re.findall(r"\d+", m.group(1).strip())
    return []


def extract_chunks_from_text(text: str) -> list[str]:
    """:340-349 — bracketed list, QUOTED contents harvested."""
    m = re.search(r"[Cc]hunks\s*[=:]\s*\[(.*?)\]", text, re.DOTALL)
    if m:
        return re.findall(r"['\"]([^'\"]*)['\"]", m.group(1).strip())
    return []


def extract_reports_from_text(text: str) -> list[str]:
    """:351-359 — Reports patterns, digits harvested."""
    m = re.search(r"[Rr]eports\s*[=:]\s*\[(.*?)\]", text, re.DOTALL) or re.search(
        r"[Rr]eports\s*[=:]\s*([\d\s,]+)", text, re.DOTALL
    )
    if m:
        return re.findall(r"\d+", m.group(1).strip())
    return []


def validate_and_format_ids(ids_list: list) -> list[str]:
    """:73-102 — drop None/empty, numbers → str(int), keep digit
    strings / long strings / any non-blank string."""
    valid: list[str] = []
    for id_value in ids_list:
        if id_value is None or id_value == "":
            continue
        if isinstance(id_value, bool):
            valid.append(str(int(id_value)))
        elif isinstance(id_value, (int, float)):
            valid.append(str(int(id_value)))
        elif isinstance(id_value, str):
            if id_value.isdigit() or id_value.lstrip("-").isdigit():
                valid.append(id_value)
            elif len(id_value) > 10:
                valid.append(id_value)
            elif id_value.strip():
                valid.append(id_value)
    return valid


def extract_references_from_answer(answer: str) -> dict[str, list[str]]:
    """:5-71 — the full ladder; exceptions yield whatever was
    extracted so far (the reference's catch-and-return). Dedup is
    sorted(set(...)) — see the module deviation note."""
    result = {k: list(v) for k, v in _EMPTY.items()}
    if not answer or "引用数据" not in answer:
        return result
    try:
        section = extract_reference_section(answer)
        if not section:
            return result
        parsed = parse_json_data(section)
        # reference gates on TRUTHINESS (:35): a parsed-but-empty (or
        # non-dict) JSON still skips the text rung when truthy
        if parsed:
            result["entities"].extend(extract_entities_from_parsed(parsed))
            result["relationships"].extend(
                extract_relationships_from_parsed(parsed)
            )
            result["chunks"].extend(extract_chunks_from_parsed(parsed))
            result["reports"].extend(extract_reports_from_parsed(parsed))
        else:
            result["entities"] = extract_entities_from_text(section)
            result["relationships"] = extract_relationships_from_text(section)
            result["chunks"] = extract_chunks_from_text(section)
            result["reports"] = extract_reports_from_text(section)
        result["entities"] = validate_and_format_ids(result["entities"])
        result["relationships"] = validate_and_format_ids(
            result["relationships"]
        )
        result["entities"] = sorted(set(result["entities"]))
        result["relationships"] = sorted(set(result["relationships"]))
        result["chunks"] = sorted(set(result["chunks"]))
        result["reports"] = sorted(set(result["reports"]))
        return result
    except Exception:
        return result
