r"""
Build an AllenNLP-format vocabulary directory from the CLEVR v1.0 train
annotations json (reference ``scripts/preprocess/build_vocabulary.py``): three
namespaces (questions, programs, answers), special tokens at indices 0..3 of the
padded namespaces, answers non-padded with @@UNKNOWN@@ last.
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from probnmn_tpu.data.preprocessing import build_vocabulary

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument(
    "-c", "--clevr-jsonpath", default="data/CLEVR_train_questions.json",
    help="Path to CLEVR v1.0 train annotation json file.",
)
parser.add_argument(
    "-o", "--output-dirpath", default="data/clevr_vocabulary",
    help="Path to a directory to save the vocabulary.",
)

if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger(__name__)
    args = parser.parse_args()

    logger.info("Loading annotations json from %s...", args.clevr_jsonpath)
    clevr_json = json.load(open(args.clevr_jsonpath))["questions"]

    vocabulary = build_vocabulary(clevr_json)
    for namespace in ("questions", "programs", "answers"):
        logger.info(
            "%s vocabulary size: %d", namespace, vocabulary.get_vocab_size(namespace)
        )
    vocabulary.save_to_files(args.output_dirpath)
    logger.info("Wrote vocabulary to %s", args.output_dirpath)
