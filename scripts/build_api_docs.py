r"""
Generate ``docs/api.md`` — the API reference mirroring the reference's Sphinx
autodoc tree (reference ``docs/index.rst:38-48``: config / data / models /
modules / trainers / evaluators / utils, plus the TPU-native additions ops /
parallel). Markdown is generated from live docstrings + signatures so the
reference can't drift silently; ``tests/test_docs.py`` regenerates and diffs.

    python scripts/build_api_docs.py [--check]
"""
import argparse
import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODULES = [
    ("Config", ["probnmn_tpu.config"]),
    ("Data", [
        "probnmn_tpu.data.readers",
        "probnmn_tpu.data.datasets",
        "probnmn_tpu.data.samplers",
        "probnmn_tpu.data.pipeline",
        "probnmn_tpu.data.vocabulary",
        "probnmn_tpu.data.preprocessing",
        "probnmn_tpu.data.native",
    ]),
    ("Models", [
        "probnmn_tpu.models.seq2seq",
        "probnmn_tpu.models.program_prior",
        "probnmn_tpu.models.program_generator",
        "probnmn_tpu.models.question_reconstructor",
        "probnmn_tpu.models.nmn",
        "probnmn_tpu.models.resnet",
    ]),
    ("Modules", ["probnmn_tpu.modules.elbo"]),
    ("Ops (TPU-native)", [
        "probnmn_tpu.ops.rnn",
        "probnmn_tpu.ops.gconv",
        "probnmn_tpu.ops.common",
        "probnmn_tpu.ops.pallas.nmn_interpreter",
        "probnmn_tpu.ops.pallas.seq2seq_decode",
        "probnmn_tpu.ops.pallas.seq2seq_train",
    ]),
    ("Parallel", ["probnmn_tpu.parallel.mesh"]),
    ("Serving", ["probnmn_tpu.serving"]),
    ("Trainers", [
        "probnmn_tpu.training._trainer",
        "probnmn_tpu.training.optim",
        "probnmn_tpu.training.program_prior_trainer",
        "probnmn_tpu.training.question_coding_trainer",
        "probnmn_tpu.training.module_training_trainer",
        "probnmn_tpu.training.joint_training_trainer",
    ]),
    ("Evaluators", [
        "probnmn_tpu.evaluators._evaluator",
        "probnmn_tpu.evaluators.program_prior_evaluator",
        "probnmn_tpu.evaluators.question_coding_evaluator",
        "probnmn_tpu.evaluators.module_training_evaluator",
        "probnmn_tpu.evaluators.joint_training_evaluator",
    ]),
    ("Utils", [
        "probnmn_tpu.utils.checkpointing",
        "probnmn_tpu.utils.metrics",
        "probnmn_tpu.utils.torch_interop",
        "probnmn_tpu.utils.observability",
        "probnmn_tpu.utils.clevr",
    ]),
]


def _doc_block(obj, indent=""):
    doc = inspect.getdoc(obj) or ""
    # First paragraph only — the full story lives in the source docstrings.
    para = doc.split("\n\n")[0].strip()
    return "\n".join(indent + line for line in para.splitlines())


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for name in names:
        obj = vars(mod).get(name)
        if inspect.isclass(obj) or inspect.isfunction(obj):
            if getattr(obj, "__module__", None) == mod.__name__:
                out.append((name, obj))
    return out


def generate() -> str:
    lines = [
        "# API reference",
        "",
        "Generated from docstrings by `scripts/build_api_docs.py` — do not edit by",
        "hand. Mirrors the reference's Sphinx API tree (reference",
        "`docs/index.rst:38-48`) plus the TPU-native `ops`/`parallel` layers.",
        "",
    ]
    for section, module_names in MODULES:
        lines += [f"## {section}", ""]
        for module_name in module_names:
            mod = importlib.import_module(module_name)
            lines += [f"### `{module_name}`", ""]
            mod_doc = _doc_block(mod)
            if mod_doc:
                lines += [mod_doc, ""]
            for name, obj in _public_members(mod):
                kind = "class" if inspect.isclass(obj) else "def"
                lines += [f"#### `{kind} {name}{_signature(obj)}`", ""]
                doc = _doc_block(obj)
                if doc:
                    lines += [doc, ""]
                if inspect.isclass(obj):
                    for mname, meth in sorted(vars(obj).items()):
                        if mname.startswith("_") or not inspect.isfunction(meth):
                            continue
                        lines += [f"- `{mname}{_signature(meth)}`"]
                        mdoc = _doc_block(meth, indent="  ")
                        if mdoc:
                            lines += [mdoc]
                    lines += [""]
    return "\n".join(lines).rstrip() + "\n"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--check", action="store_true",
                        help="Exit 1 if docs/api.md is stale.")
    args = parser.parse_args()
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "api.md")
    content = generate()
    if args.check:
        current = open(path).read() if os.path.exists(path) else ""
        if current != content:
            print("docs/api.md is stale — run scripts/build_api_docs.py")
            return 1
        print("docs/api.md is current")
        return 0
    with open(path, "w") as f:
        f.write(content)
    print(f"wrote {os.path.normpath(path)} ({len(content.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
