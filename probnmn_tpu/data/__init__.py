from probnmn_tpu.data.vocabulary import Vocabulary  # noqa: F401
