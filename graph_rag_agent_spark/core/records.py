"""Extraction-record grammar: parse semantics of the reference writer.

Grammar (reference config/prompt.py:9,17 + delimiters at
graph/extraction/entity_extractor.py:44-46):

    ("entity" : "NAME" : "TYPE" : "DESCRIPTION")
    ("relationship" : "SRC" : "TGT" : "REL_TYPE" : "DESCRIPTION" : WEIGHT)

record delimiter '\\n', completion delimiter '\\n\\n', tuple
delimiter ' : '.

Parse behavior transcribed from graph_writer.convert_to_graph_document
(/root/reference/graph/extraction/graph_writer.py:36-131):
  - non-greedy regexes, '.' does NOT match newlines (no DOTALL), so a
    malformed record simply fails to match and the rest still parses;
  - duplicate entity ids in one result: FIRST description wins;
  - a relationship endpoint never declared as an entity becomes a node
    with type '未知' and description 'No additional data';
  - float(WEIGHT) failure (or any exception) aborts the WHOLE chunk:
    it yields an empty result (graph_writer.py:111-121);
  - chunks with zero nodes and zero relationships are dropped
    downstream (graph_writer.py:179-184).
"""

from __future__ import annotations

import re

NODE_RE = re.compile(r'\("entity" : "(.+?)" : "(.+?)" : "(.+?)"\)')
REL_RE = re.compile(r'\("relationship" : "(.+?)" : "(.+?)" : "(.+?)" : "(.+?)" : (.+?)\)')

UNKNOWN_TYPE = "未知"
UNKNOWN_DESC = "No additional data"


def parse_extraction(result: str) -> tuple[list[tuple[str, str, str]], list[tuple[str, str, str, str, float]]]:
    """Parse one extractor result string.

    Returns (nodes, relationships) where nodes are
    (entity_id, entity_type, description) in first-appearance order and
    relationships are (src, tgt, rel_type, description, weight).
    Any exception → ([], []) — the reference's empty-GraphDocument path.
    """
    if not result:
        return [], []
    nodes: dict[str, tuple[str, str, str]] = {}
    rels: list[tuple[str, str, str, str, float]] = []
    try:
        for node_id, node_type, description in NODE_RE.findall(result):
            if node_id not in nodes:
                nodes[node_id] = (node_id, node_type, description)
        for src, tgt, rel_type, description, weight in REL_RE.findall(result):
            for endpoint in (src, tgt):
                if endpoint not in nodes:
                    nodes[endpoint] = (endpoint, UNKNOWN_TYPE, UNKNOWN_DESC)
            rels.append((src, tgt, rel_type, description, float(weight)))
    except Exception:
        return [], []
    return list(nodes.values()), rels


def format_entity_record(name: str, entity_type: str, description: str) -> str:
    return f'("entity" : "{name}" : "{entity_type}" : "{description}")'


def format_relationship_record(
    src: str, tgt: str, rel_type: str, description: str, weight: float
) -> str:
    return f'("relationship" : "{src}" : "{tgt}" : "{rel_type}" : "{description}" : {weight:g})'


BATCH_SEPARATOR = "\n" + "-" * 50 + "\n"  # entity_extractor.py:264


def split_batch_response(batch_content: str) -> list[str]:
    """Split a batched-extraction response back into per-chunk results
    (reference entity_extractor.py:320-332)."""
    return [part.strip() for part in batch_content.split(BATCH_SEPARATOR)]
