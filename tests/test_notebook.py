"""The notebook (reference parity: transcribe_colab.ipynb) must stay
importable against the current package — every `from manual_whisper_tpu...`
in its code cells has to resolve, and the cells must parse."""

import ast
import importlib
import json
from pathlib import Path

NB = Path(__file__).resolve().parent.parent / "notebooks/transcribe_tpu.ipynb"


def test_notebook_cells_parse_and_imports_resolve():
    nb = json.loads(NB.read_text(encoding="utf-8"))
    checked = 0
    for ci, cell in enumerate(nb["cells"]):
        if cell["cell_type"] != "code":
            continue
        src = "".join(line for line in cell["source"]
                      if not line.lstrip().startswith(("%", "!")))
        tree = ast.parse(src)  # raises on broken cells
        for node in ast.walk(tree):
            if not (isinstance(node, ast.ImportFrom) and node.module
                    and node.module.startswith("manual_whisper_tpu")):
                continue
            mod = importlib.import_module(node.module)
            for alias in node.names:
                ok = hasattr(mod, alias.name)
                if not ok:  # `from pkg import submodule` form
                    try:
                        importlib.import_module(
                            f"{node.module}.{alias.name}")
                        ok = True
                    except ImportError:
                        ok = False
                assert ok, f"cell {ci}: {node.module}.{alias.name}"
                checked += 1
    assert checked >= 5  # the notebook really does use the package


def test_notebook_has_no_hardcoded_tokens():
    """The reference notebook leaked a real HF token (SURVEY.md C3);
    ours must never contain one."""
    text = NB.read_text(encoding="utf-8")
    assert "hf_" + "A" not in text  # pattern check below is the real gate
    import re
    assert not re.search(r"hf_[A-Za-z0-9]{20,}", text)
