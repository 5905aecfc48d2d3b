r"""
Tokenize CLEVR questions/programs/answers into a padded H5 file (reference
``scripts/preprocess/preprocess_questions.py``): programs in prefix notation
(pre-order traversal of the ``inputs`` tree), zero-padded to split max lengths;
datasets ``questions``, ``programs``, ``answers``, ``image_indices``; attr ``split``.
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import h5py
import numpy as np
from tqdm import tqdm

from probnmn_tpu.data.preprocessing import tokenize_program, tokenize_question
from probnmn_tpu.data.vocabulary import Vocabulary

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("-c", "--clevr-jsonpath", default="data/CLEVR_train_questions.json")
parser.add_argument("-v", "--vocab-dirpath", default="data/vocabulary")
parser.add_argument("-o", "--output-h5path", default="data/clevr_train_tokens.h5")
parser.add_argument("-s", "--split", default="train", choices=["train", "val", "test"])

if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger(__name__)
    args = parser.parse_args()

    logger.info("Loading annotations json from %s...", args.clevr_jsonpath)
    clevr_json = json.load(open(args.clevr_jsonpath))["questions"]
    vocabulary = Vocabulary.from_files(args.vocab_dirpath)

    image_indices, answers = [], []
    tokenized_questions, tokenized_programs = [], []
    for item in tqdm(clevr_json, desc="tokenizing"):
        tokenized_questions.append(tokenize_question(item["question"]))
        image_indices.append(item["image_index"])
        if args.split != "test":
            tokenized_programs.append(tokenize_program(item["program"]))
            answers.append(vocabulary.get_token_index(item["answer"], "answers"))

    question_max_length = max(len(q) for q in tokenized_questions)
    questions = np.zeros((len(tokenized_questions), question_max_length), np.int64)
    for i, tokens in enumerate(tokenized_questions):
        questions[i, : len(tokens)] = [
            vocabulary.get_token_index(t, "questions") for t in tokens
        ]

    with h5py.File(args.output_h5path, "w") as output_h5:
        output_h5["image_indices"] = np.asarray(image_indices, np.int64)
        output_h5["questions"] = questions
        if args.split != "test":
            program_max_length = max(len(p) for p in tokenized_programs)
            programs = np.zeros((len(tokenized_programs), program_max_length), np.int64)
            for i, tokens in enumerate(tokenized_programs):
                programs[i, : len(tokens)] = [
                    vocabulary.get_token_index(t, "programs") for t in tokens
                ]
            output_h5["programs"] = programs
            output_h5["answers"] = np.asarray(answers, np.int64)
        output_h5.attrs["split"] = args.split
    logger.info("Wrote tokenized data to %s", args.output_h5path)
