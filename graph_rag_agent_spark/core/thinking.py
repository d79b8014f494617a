"""Deep-research thinking/decomposition rule core — the deterministic
parsing, classification and assembly rules inside the reference's
ThinkingEngine (/root/reference/search/tool/reasoning/thinking.py),
QueryGenerator / DualPathSearcher
(/root/reference/search/tool/reasoning/search.py) and nlp helpers
(/root/reference/search/tool/reasoning/nlp.py), transcribed as pure
functions. The LLM calls that surround them in the reference are the
orchestration layer; everything here is what happens to the TEXT the
model returns, which is the part a data engine replays over a table
of traces (operators/thinking.py).

Documented deviation (same policy as core/stub_judge F11): the
reference parses model-emitted Python lists with ``eval``
(search.py:239,312); this core uses ``ast.literal_eval`` — identical
results on every literal the prompt format names, and not an
arbitrary-code sink.
"""

from __future__ import annotations

import ast
import json
import re

#: /root/reference/config/reasoning_prompts.py:3-6
BEGIN_SEARCH_QUERY = "<|begin_search_query|>"
END_SEARCH_QUERY = "<|end_search_query|>"
BEGIN_SEARCH_RESULT = "<|begin_search_result|>"
END_SEARCH_RESULT = "<|end_search_result|>"

_THINK_RE = re.compile(r"<think>.*</think>", re.DOTALL)
_LIST_RE = re.compile(r"\[.*\]", re.DOTALL)


def extract_between(text: str, start_marker: str, end_marker: str) -> list[str]:
    """nlp.py:4-18."""
    pattern = re.escape(start_marker) + r"(.*?)" + re.escape(end_marker)
    return re.findall(pattern, text, flags=re.DOTALL)


def extract_from_templates(
    text: str, templates: list[str], regex: bool = False
) -> list[str]:
    """nlp.py:19-45: extract via `{}`-placeholder templates.

    Reference quirk preserved VERBATIM: the non-regex branch replaces
    `{}` with `(.*?)` BEFORE `re.escape`, then tries to un-escape the
    placeholder with the literal `\\(\\*\\*\\?\\)` — but `re.escape`
    actually produced `\\(\\.\\*\\?\\)` (a `\\.` for the dot, not a
    second star), so the restore never fires and the compiled pattern
    matches the literal text ``(.*?)``. A template like ``"answer:
    {}"`` therefore matches nothing unless the input literally
    contains ``answer: (.*?)``. The regex=True branch is the live
    path in the reference; the dead placeholder branch is transcribed
    bug-for-bug for parity, not fixed."""
    results: list[str] = []
    for template in templates:
        if regex:
            results.extend(re.findall(template, text, re.DOTALL))
        else:
            pattern = template.replace("{}", "(.*?)")
            pattern = re.escape(pattern).replace("\\(\\*\\*\\?\\)", "(.*?)")
            results.extend(re.findall(pattern, text, re.DOTALL))
    return results


def extract_sentences(text: str, max_sentences: int | None = None) -> list[str]:
    """nlp.py:48-69: split at terminator + capital-letter boundaries."""
    if not text:
        return []
    sentences = re.split(r"(?<=[.!?])\s+(?=[A-Z])", text)
    sentences = [s.strip() for s in sentences if s.strip()]
    if max_sentences:
        return sentences[:max_sentences]
    return sentences


def remove_query_tags(text: str) -> str:
    """thinking.py:588-599."""
    pattern = (
        re.escape(BEGIN_SEARCH_QUERY) + r"(.*?)" + re.escape(END_SEARCH_QUERY)
    )
    return re.sub(pattern, "", text, flags=re.DOTALL)


def remove_result_tags(text: str) -> str:
    """thinking.py:601-612."""
    pattern = (
        re.escape(BEGIN_SEARCH_RESULT)
        + r"(.*?)"
        + re.escape(END_SEARCH_RESULT)
    )
    return re.sub(pattern, "", text, flags=re.DOTALL)


def extract_queries(text: str) -> list[str]:
    """thinking.py:614-625."""
    return extract_between(text, BEGIN_SEARCH_QUERY, END_SEARCH_QUERY)


def classify_next_query(raw: str) -> dict:
    """The post-LLM logic of generate_next_query (thinking.py:626-680):
    strip <think> spans; empty → 'empty'; tagged queries → 'has_query';
    otherwise the answer markers（**回答** / 足够的信息）→ 'answer_ready',
    else 'no_query'. Returns {"status", "content", "queries"}."""
    query_think = _THINK_RE.sub("", raw)
    if not query_think:
        return {"status": "empty", "content": None, "queries": []}
    queries = extract_queries(query_think)
    if not queries:
        if "**回答**" in query_think or "足够的信息" in query_think:
            return {
                "status": "answer_ready",
                "content": query_think,
                "queries": [],
            }
        return {"status": "no_query", "content": query_think, "queries": []}
    return {"status": "has_query", "content": query_think, "queries": queries}


def parse_sub_queries(content: str, original_query: str) -> list[str]:
    """generate_sub_queries' parse ladder (search.py:218-246): first
    bracketed span parsed as a list; any failure → [original_query].
    The broad except mirrors the reference's bare ``except Exception``
    — adversarial literals can raise beyond ValueError/SyntaxError
    (deep nesting → RecursionError, huge repeats → MemoryError)."""
    list_text = _LIST_RE.search(content)
    if list_text:
        try:
            sub_queries = ast.literal_eval(list_text.group(0))
            if isinstance(sub_queries, (list, tuple)):
                return list(sub_queries)
        except Exception:
            pass
    return [original_query]


def parse_followup_queries(content: str) -> list[str]:
    """generate_followup_queries' parse ladder (search.py:283-345):
    bracketed list parsed, order-preserving dedup; failure → []."""
    list_text = _LIST_RE.search(content)
    if list_text:
        try:
            followups = ast.literal_eval(list_text.group(0))
        except Exception:  # the reference's bare except (search.py:328)
            return []
        if isinstance(followups, (list, tuple)):
            unique: list = []
            for q in followups:
                if q not in unique:
                    unique.append(q)
            return unique
    return []


def parse_hypotheses(content: str) -> list[dict]:
    """generate_hypotheses' parse ladder (thinking.py:66-167): a
    bracketed JSON list of {hypothesis, reasoning} dicts, else the
    regex fallback, else the default hypothesis. A parsed list whose
    items are not dicts carrying BOTH keys also falls back — the
    reference's formatting loop reads hyp['hypothesis'] /
    hyp['reasoning'] inside the same try, so a string item or a
    missing key raises there and lands in the fallback."""
    json_match = _LIST_RE.search(content)
    if json_match:
        try:
            hypotheses = json.loads(json_match.group(0))
            if isinstance(hypotheses, list) and all(
                isinstance(h, dict) and "hypothesis" in h and "reasoning" in h
                for h in hypotheses
            ):
                return hypotheses
        except (ValueError, TypeError):
            pass
    return extract_hypotheses_fallback(content)


def extract_hypotheses_fallback(content: str) -> list[dict]:
    """_extract_hypotheses_fallback (thinking.py:118-167)."""
    hypotheses = []
    pattern = re.compile(
        r"假设\s*\d+[:：]?\s*(.*?)(?=假设\s*\d+[:：]?|$)", re.DOTALL
    )
    for match in pattern.findall(content):
        parts = re.split(r"理由[:：]", match, maxsplit=1)
        if len(parts) == 2:
            hypothesis, reasoning = parts
        else:
            hypothesis, reasoning = parts[0], ""
        hypotheses.append(
            {"hypothesis": hypothesis.strip(), "reasoning": reasoning.strip()}
        )
    if not hypotheses:
        hypotheses = [
            {
                "hypothesis": "问题可能需要更多背景信息",
                "reasoning": "初步思考中没有明确的答案方向",
            }
        ]
    return hypotheses


def parse_hypothesis_list(content: str) -> list[str]:
    """generate_multiple_hypotheses' parse ladder (search.py:248-310):
    numbered list → dash list → long-line filter capped at 3."""
    numbered = re.compile(r"\d+\.\s*(.*?)(?=\d+\.|$)", re.DOTALL).findall(
        content
    )
    if numbered:
        return [m.strip() for m in numbered if m.strip()]
    dashed = re.compile(r"-\s*(.*?)(?=-|$)", re.DOTALL).findall(content)
    if dashed:
        return [m.strip() for m in dashed if m.strip()]
    lines = [line.strip() for line in content.split("\n") if line.strip()]
    return [
        line
        for line in lines
        if len(line) > 10
        and not line.startswith("假设")
        and not line.startswith("以下是")
    ][:3]


def verification_status(status_text: str) -> str:
    """_assess_verification_status' normalization rung
    (thinking.py:240-250): the LLM's word → supported/rejected/
    uncertain."""
    status = status_text.strip().lower()
    if "support" in status:
        return "supported"
    if "reject" in status:
        return "rejected"
    return "uncertain"


#: thinking.py:553-586 conclusion markers, in priority order
CONCLUSION_MARKERS = ("结论", "总结", "因此", "所以", "综上所述")


def extract_conclusion(analysis: str) -> str:
    """_extract_conclusion (thinking.py:553-586): first marker's line
    (capped at 100 chars), else the last paragraph, else the default
    text."""
    for marker in CONCLUSION_MARKERS:
        idx = analysis.find(marker)
        if idx != -1:
            conclusion = analysis[idx:].split("\n")[0]
            if len(conclusion) > 100:
                conclusion = conclusion[:100] + "..."
            return conclusion
    paragraphs = analysis.split("\n\n")
    if paragraphs:
        last = paragraphs[-1]
        if len(last) > 100:
            last = last[:100] + "..."
        return last
    return "无法提取明确结论"


def truncate_reasoning(steps: list[str]) -> str:
    """prepare_truncated_reasoning (thinking.py:723-773): ≤5 steps
    keep everything; else step 1 + last 4 + any tagged middle step,
    '...' between gaps."""
    if not steps:
        return ""
    if len(steps) <= 5:
        return "".join(
            f"Step {i + 1}: {step}\n\n" for i, step in enumerate(steps)
        ).strip()
    important = [(0, steps[0])]
    for i in range(max(1, len(steps) - 4), len(steps)):
        important.append((i, steps[i]))
    for i in range(1, len(steps) - 4):
        if BEGIN_SEARCH_QUERY in steps[i] or BEGIN_SEARCH_RESULT in steps[i]:
            important.append((i, steps[i]))
    important.sort(key=lambda x: x[0])
    truncated = ""
    prev_idx = -1
    for idx, step in important:
        if idx > prev_idx + 1:
            truncated += "...\n\n"
        truncated += f"Step {idx + 1}: {step}\n\n"
        prev_idx = idx
    return truncated.strip()


def full_thinking(steps: list[str]) -> str:
    """get_full_thinking (thinking.py:775-790)."""
    thinking = "<think>\n"
    for step in steps:
        thinking += remove_result_tags(remove_query_tags(step)) + "\n\n"
    return thinking + "</think>"


def verification_summary(verifications: list[dict]) -> str:
    """update_thinking_based_on_verification's summary assembly
    (thinking.py:297-334)."""
    supported, rejected, uncertain = [], [], []
    for v in verifications:
        if v["status"] == "supported":
            supported.append(v["hypothesis"])
        elif v["status"] == "rejected":
            rejected.append(v["hypothesis"])
        else:
            uncertain.append(v["hypothesis"])
    out = "验证结果汇总:\n"
    out += f"- 被支持的假设: {len(supported)}\n"
    if supported:
        out += "  " + "\n  ".join(supported) + "\n"
    out += f"- 被拒绝的假设: {len(rejected)}\n"
    if rejected:
        out += "  " + "\n  ".join(rejected) + "\n"
    out += f"- 不确定的假设: {len(uncertain)}\n"
    if uncertain:
        out += "  " + "\n  ".join(uncertain) + "\n"
    return out


def integrate_thinking(
    initial_thinking: str,
    hypotheses: list[dict],
    verifications: list[dict],
    updated_thinking: str,
) -> str:
    """integrate_thinking_process (thinking.py:355-393)."""
    out = "# 思考过程\n\n## 初步分析\n\n" + initial_thinking + "\n\n"
    out += "## 假设生成\n\n"
    for i, hyp in enumerate(hypotheses):
        out += f"### 假设 {i + 1}: {hyp['hypothesis']}\n"
        out += f"{hyp['reasoning']}\n\n"
    out += "## 假设验证\n\n"
    status_map = {
        "supported": "✅ 支持",
        "rejected": "❌ 拒绝",
        "uncertain": "❓ 不确定",
    }
    for i, ver in enumerate(verifications):
        status = status_map.get(ver["status"], "未知")
        out += f"### 验证 {i + 1}: {ver['hypothesis']} [{status}]\n"
        out += f"{ver['verification']}\n\n"
    out += "## 最终思考\n\n" + updated_thinking
    return out


class BranchTree:
    """The ThinkingEngine's reasoning-branch state machine
    (thinking.py:413-494) minus the timestamps (injected so replays
    are deterministic): branch_reasoning copies the base branch,
    switch_branch validates, merge_branches appends the source's
    content-novel steps plus a merge marker and lands on the target.
    """

    def __init__(self):
        self.tree: dict[str, list[dict]] = {"main": []}
        self.current = "main"

    def add_step(self, content: str, timestamp: float = 0.0) -> None:
        self.tree.setdefault(self.current, []).append(
            {"content": content, "timestamp": timestamp}
        )

    def branch(self, branch_name: str, base_branch: str = "main") -> None:
        """thinking.py:413-438: unknown base falls back to main; the
        new branch copies the base and becomes current, then records
        the creation step. The empty-assign-THEN-copy order matters:
        branching a name onto itself empties it first (the reference
        iterates the now-empty list), keeping only the creation
        step."""
        if base_branch not in self.tree:
            base_branch = "main"
        self.tree[branch_name] = []
        for step in self.tree[base_branch]:
            self.tree[branch_name].append(step.copy())
        self.current = branch_name
        self.add_step(f"创建推理分支: {branch_name}，基于: {base_branch}")

    def switch(self, branch_name: str) -> bool:
        """thinking.py:438-451."""
        if branch_name not in self.tree:
            return False
        self.current = branch_name
        return True

    def merge(
        self,
        source_branch: str,
        target_branch: str = "main",
        timestamp: float = 0.0,
    ) -> bool:
        """thinking.py:453-494: steps whose CONTENT the target lacks
        append in source order, then the merge marker; current lands
        on the target."""
        if source_branch not in self.tree or target_branch not in self.tree:
            return False
        target_contents = [
            step["content"] for step in self.tree[target_branch]
        ]
        for step in self.tree[source_branch]:
            if step["content"] not in target_contents:
                self.tree[target_branch].append(step.copy())
        self.tree[target_branch].append(
            {
                "content": f"合并分支: {source_branch} → {target_branch}",
                "timestamp": timestamp,
            }
        )
        self.current = target_branch
        return True


def contradiction_analysis_text(contradiction: dict) -> str:
    """deeper_research_tool.py:355-362: the per-contradiction evidence
    string recorded into the chain."""
    ctype = contradiction.get("type", "unknown")
    if ctype == "numerical":
        return (
            f"数值矛盾: 在 '{contradiction.get('context', '')}' 中, "
            f"发现值 {contradiction.get('value1')} 和 "
            f"{contradiction.get('value2')}"
        )
    if ctype == "semantic":
        return f"语义矛盾: {contradiction.get('analysis', '')}"
    return ""


def merge_branch_reasoning(
    branches: dict[str, dict], step_evidence: dict[str, list[dict]]
) -> str:
    """_merge_reasoning_branches' markdown assembly
    (deeper_research_tool.py:408-455): per branch, the hypothesis,
    up to 3 evidence contents (200-char caps) and the optional
    counter-factual analysis (200-char cap). ``branches`` maps
    branch_name → {hypothesis, step_id, counter_analysis?};
    ``step_evidence`` maps step_id → evidence dicts."""
    branch_names = list(branches)
    if not branch_names:
        return ""
    merged = "## 多分支推理结果\n\n"
    for branch_name in branch_names:
        info = branches[branch_name]
        evidence = step_evidence.get(info.get("step_id", ""), [])
        merged += f"### 分支: {branch_name}\n"
        merged += f"假设: {info['hypothesis']}\n\n"
        if evidence:
            merged += "主要发现:\n"
            for ev in evidence[:3]:
                content = ev.get("content", "")
                if len(content) > 200:
                    content = content[:200] + "..."
                merged += f"- {content}\n"
        if "counter_analysis" in info:
            counter = info["counter_analysis"]
            if len(counter) > 200:
                counter = counter[:200] + "..."
            merged += f"\n反事实分析: {counter}\n\n"
        merged += "\n"
    return merged


def evaluate_route(result_text: str) -> str:
    """DualPathSearcher's evaluation normalize rung (search.py:
    131-138): the LLM's verdict word → precise/kb/both."""
    result = result_text.strip().lower()
    if "precise" in result:
        return "precise"
    if "kb" in result:
        return "kb"
    return "both"


#: search.py:45-46 — a result side counts as having content when its
#: joined chunk text exceeds this many stripped chars
DUAL_CONTENT_GATE = 50


def route_dual_results(
    precise_has_content: bool, kb_has_content: bool, evaluation: str
) -> str:
    """The dual-path routing ladder (search.py:48-73): exactly one
    side with content wins outright; neither → merge; both → the
    evaluation verdict ('both' merges)."""
    if precise_has_content and not kb_has_content:
        return "precise"
    if kb_has_content and not precise_has_content:
        return "kb"
    if not precise_has_content and not kb_has_content:
        return "merge"
    if evaluation == "precise":
        return "precise"
    if evaluation == "kb":
        return "kb"
    return "merge"


def merge_search_results(result1: dict, result2: dict) -> dict:
    """_merge_results (search.py:145-205): result1's chunks/doc_aggs
    win; result2's append when their chunk_id / doc_id (or, for
    id-less chunks, their text) is new; every other key copies from
    result2 when absent, or list-extends with not-in dedup."""
    result = {
        "chunks": list(result1.get("chunks", [])),
        "doc_aggs": list(result1.get("doc_aggs", [])),
    }
    if not result["chunks"]:
        return result2
    existing_chunk_ids = {
        c.get("chunk_id") for c in result["chunks"] if "chunk_id" in c
    }
    existing_doc_ids = {
        d.get("doc_id") for d in result["doc_aggs"] if "doc_id" in d
    }
    for chunk in result2.get("chunks", []):
        chunk_id = chunk.get("chunk_id")
        if chunk_id and chunk_id not in existing_chunk_ids:
            result["chunks"].append(chunk)
            existing_chunk_ids.add(chunk_id)
        elif not chunk_id:
            content = chunk.get("text", "")
            if not any(c.get("text") == content for c in result["chunks"]):
                result["chunks"].append(chunk)
    for doc in result2.get("doc_aggs", []):
        doc_id = doc.get("doc_id")
        if doc_id and doc_id not in existing_doc_ids:
            result["doc_aggs"].append(doc)
            existing_doc_ids.add(doc_id)
    for key in result2:
        if key not in ["chunks", "doc_aggs"]:
            if key not in result:
                result[key] = result2[key]
            elif isinstance(result[key], list) and isinstance(
                result2[key], list
            ):
                result[key].extend(
                    item for item in result2[key] if item not in result[key]
                )
    return result


def dual_path_queries(query: str, kb_name: str) -> tuple[str, str]:
    """DualPathSearcher.search's query construction (search.py:31-36):
    the precise query strips the KB name; the KB query prefixes it
    unless already present (case-insensitive)."""
    precise_query = query.replace(kb_name, "").strip()
    kb_query = (
        f"{kb_name} {query}"
        if kb_name.lower() not in query.lower()
        else query
    )
    return precise_query, kb_query
