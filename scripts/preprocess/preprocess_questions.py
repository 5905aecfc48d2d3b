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

from probnmn_tpu.data import native
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
    program_id_rows = []
    for item in tqdm(clevr_json, desc="tokenizing programs"):
        image_indices.append(item["image_index"])
        if args.split != "test":
            program_id_rows.append(native.program_prefix_ids(item["program"], vocabulary))
            answers.append(vocabulary.get_token_index(item["answer"], "answers"))

    # Questions: batch-tokenized by the native C++ runtime (Python fallback inside).
    tokenizer = native.NativeTokenizer(vocabulary, "questions")
    logger.info("Question tokenizer backend: %s", "native C++" if tokenizer.native else "python")
    ids, lengths = tokenizer.tokenize_questions(
        [item["question"] for item in clevr_json], max_len=128
    )
    question_max_length = int(lengths.max())
    questions = ids[:, :question_max_length].astype(np.int64)

    with h5py.File(args.output_h5path, "w") as output_h5:
        output_h5["image_indices"] = np.asarray(image_indices, np.int64)
        output_h5["questions"] = questions
        if args.split != "test":
            program_max_length = max(len(p) for p in program_id_rows)
            programs = np.zeros((len(program_id_rows), program_max_length), np.int64)
            for i, row in enumerate(program_id_rows):
                programs[i, : len(row)] = row
            output_h5["programs"] = programs
            output_h5["answers"] = np.asarray(answers, np.int64)
        output_h5.attrs["split"] = args.split
    logger.info("Wrote tokenized data to %s", args.output_h5path)
