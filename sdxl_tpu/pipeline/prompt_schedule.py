"""Prompt editing / scheduling — the A1111 prompt-travel grammar.

Capability extension (the reference has a fixed prompt per run,
stablediffusion/mod.rs:660-696). Implements the de-facto webui syntax on
top of the segmented-scan machinery the step previews use:

  ``[from:to:when]``  — render "from" until the boundary, "to" after.
  ``[to:when]``       — add "to" after the boundary.
  ``[from::when]``    — drop "from" after the boundary.
  ``[a|b|c]``         — alternate between the options every step.

``when`` < 1 is a fraction of the step count, >= 1 an absolute 1-indexed
step; both follow A1111's ``prompt_parser.get_learned_conditioning_prompt_
schedules`` semantics exactly: boundary = min(steps, int(when * steps))
(fraction) or min(steps, int(when)), and 1-indexed step s uses "from"
while s <= boundary. Alternation picks option ``(s - 1) % n``.

Brackets WITHOUT a trailing number or a pipe (the attention-weakening
``[word]`` of the emphasis grammar) are left untouched — like A1111, the
schedule layer runs FIRST and hands each per-step prompt to
pipeline/prompt.py's emphasis parser afterwards. Nesting resolves
innermost-first, matching the recursive grammar.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

# innermost bracket group: no nested brackets inside
_INNER = re.compile(r"\[([^\[\]]*)\]")
# placeholders protect non-schedule brackets from re-matching
_LP, _RP = "\x00", "\x01"


def _boundary(when: str, n_steps: int) -> Optional[int]:
    """A1111 boundary: fraction -> int(when*steps), else int(when);
    clamped to steps. None if `when` is not a number."""
    try:
        v = float(when)
    except ValueError:
        return None
    if v < 1:
        v *= n_steps
    return min(n_steps, int(v))


def prompt_at_step(text: str, step: int, n_steps: int) -> str:
    """The prompt rendered at 1-indexed sampling step `step`.

    Resolves every schedule construct (innermost first, so nested
    constructs like ``[a:[b|c]:0.5]`` work); leaves attention brackets
    (``[word]``) intact for the emphasis parser."""

    def resolve(m: re.Match) -> str:
        content = m.group(0)[1:-1]
        if "|" in content:
            words = content.split("|")
            return words[(step - 1) % len(words)]
        parts = content.split(":")
        if len(parts) >= 2:
            b = _boundary(parts[-1].strip(), n_steps)
            if b is not None:
                if len(parts) == 2:  # [to:when] — add after the boundary
                    before, after = "", parts[0]
                else:
                    before = ":".join(parts[:-2])
                    after = parts[-2]
                return before if step <= b else after
        # plain attention bracket: protect and keep
        return _LP + content + _RP

    prev = None
    while prev != text:
        prev = text
        text = _INNER.sub(resolve, text)
    return text.replace(_LP, "[").replace(_RP, "]")


def parse_batch_schedule(
    prompts: Sequence[str], n_steps: int
) -> Optional[List[Tuple[int, List[str]]]]:
    """Per-step prompts for a batch, grouped into segments.

    Returns ``[(n_segment_steps, [prompt per image]), ...]`` covering all
    n_steps, or None when no prompt contains live editing syntax (the
    static fast path — everything then takes the ordinary one-scan
    samplers). A schedule that RESOLVES to one constant prompt different
    from the raw text (e.g. a boundary clamped to 0 or n_steps) returns a
    single segment carrying the resolved prompt, so the editing syntax
    never leaks into the tokenizer. Batch entries may carry different
    schedules; a segment boundary is any step where ANY image's prompt
    changes (the union grid)."""
    per_step = [
        tuple(prompt_at_step(p, s, n_steps) for p in prompts)
        for s in range(1, n_steps + 1)
    ]
    if all(ps == per_step[0] for ps in per_step):
        if list(per_step[0]) == list(prompts):
            return None  # no editing syntax at all
        return [(n_steps, list(per_step[0]))]
    segments: List[Tuple[int, List[str]]] = []
    start = 0
    for i in range(1, n_steps + 1):
        if i == n_steps or per_step[i] != per_step[start]:
            segments.append((i - start, list(per_step[start])))
            start = i
    return segments
