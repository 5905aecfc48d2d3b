from probnmn_tpu.models import program_generator, program_prior, question_reconstructor  # noqa: F401
from probnmn_tpu.models.seq2seq import Seq2SeqSpec, seq2seq_forward  # noqa: F401
