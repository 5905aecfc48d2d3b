r"""
CLEVR preprocessing primitives shared by the ``scripts/preprocess`` CLIs
(reference ``scripts/preprocess/{build_vocabulary,preprocess_questions}.py``).

- question tokenization: punctuation split with the reference's exact filters
  ("?", "." dropped; "," and ";" kept as tokens),
- program tokenization: program list -> tree via ``inputs`` indices -> PREFIX
  notation by pre-order traversal, with value inputs folded as ``fn[value]``,
- vocabulary construction over the three namespaces with the reference's
  ordering (sorted unique tokens; answers sorted + @@UNKNOWN@@ last).
"""
from __future__ import annotations

from typing import Any, Dict, List

from probnmn_tpu.data.vocabulary import SPECIAL_TOKENS, Vocabulary

PUNCTUATIONS: List[str] = ["?", ".", ",", ";"]


def tokenize_question(question: str) -> List[str]:
    for punctuation in PUNCTUATIONS:
        question = question.replace(punctuation, f" {punctuation}")
    return [token for token in question.split(" ") if token not in {"?", ".", ""}]


def program_token_name(program_token: Dict[str, Any]) -> str:
    function = program_token["function"]
    if len(program_token["value_inputs"]) > 0:
        function += "[" + ",".join(program_token["value_inputs"]) + "]"
    return function


def tokenize_program(program_list: List[Dict[str, Any]]) -> List[str]:
    r"""CLEVR program list -> prefix notation (pre-order traversal of the tree
    rooted at the LAST program token, children via ``inputs`` indices)."""
    prefix: List[str] = []

    def visit(token: Dict[str, Any]) -> None:
        prefix.append(program_token_name(token))
        for child_index in token["inputs"]:
            visit(program_list[child_index])

    visit(program_list[-1])
    return prefix


def build_vocabulary(clevr_json: List[Dict[str, Any]]) -> Vocabulary:
    r"""Build the 3-namespace vocabulary from CLEVR train annotations."""
    question_tokens: set = set()
    program_tokens: set = set()
    answers: set = set()
    for item in clevr_json:
        sequence = item["question"]
        for punctuation in PUNCTUATIONS:
            sequence = sequence.replace(punctuation, f" {punctuation}")
        # NOTE: the reference's vocabulary builder keeps empty-string tokens out
        # implicitly via set semantics but does NOT filter "" — we match its
        # filter set {"?", "."} exactly (build_vocabulary.py:76).
        question_tokens |= {t for t in sequence.split(" ") if t not in {"?", "."}}
        for program_token in item.get("program", []):
            program_tokens.add(program_token_name(program_token))
        if "answer" in item:
            answers.add(item["answer"])

    return Vocabulary(
        {
            "questions": SPECIAL_TOKENS + sorted(question_tokens),
            "programs": SPECIAL_TOKENS + sorted(program_tokens),
            "answers": sorted(answers) + ["@@UNKNOWN@@"],
        },
        non_padded_namespaces=["answers"],
    )
