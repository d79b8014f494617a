"""Deterministic community-summarizer stub.

Stands in for the reference's LLM community summarization
(/root/reference/community/summary/base.py:156-166). The community
info is first stringified exactly like BaseCommunityDescriber
.prepare_string (summary/base.py:15-45: "Nodes are:\\n..." +
"Relationships are:\\n...") — that string is stored as full_content —
and the stub summary is a deterministic template over it. Summaries
shorter than 10 chars are skipped by the reference
(summary/base.py:258-265); the template always exceeds that.
"""

from __future__ import annotations


def prepare_string(nodes: list[dict], rels: list[dict]) -> str:
    """Transcribed from BaseCommunityDescriber.prepare_string
    (summary/base.py:15-45)."""
    nodes_str = "Nodes are:\n"
    for node in nodes:
        node_id = node.get("id", "unknown_id")
        node_type = node.get("type", "unknown_type")
        desc = node.get("description")
        node_description = f", description: {desc}" if desc else ""
        nodes_str += f"id: {node_id}, type: {node_type}{node_description}\n"

    rels_str = "Relationships are:\n"
    for rel in rels:
        start = rel.get("start", "unknown_start")
        end = rel.get("end", "unknown_end")
        rel_type = rel.get("type", "unknown_type")
        desc = rel.get("description")
        description = f", description: {desc}" if desc else ""
        rels_str += f"({start})-[:{rel_type}]->({end}){description}\n"

    return nodes_str + "\n" + rels_str


def stub_summarize(community_id: str, nodes: list[dict], rels: list[dict]) -> str:
    node_ids = sorted(str(n.get("id", "")) for n in nodes)
    head = ", ".join(node_ids[:5])
    return (
        f"Community {community_id} contains {len(nodes)} entities and "
        f"{len(rels)} relationships. Key members: {head}."
    )
