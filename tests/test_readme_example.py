"""The README quickstart must actually run (library-surface smoke)."""

import re
import pathlib

import jax
import jax.numpy as jnp


def test_readme_quickstart_runs():
    readme = pathlib.Path(__file__).resolve().parent.parent / "README.md"
    blocks = re.findall(r"```python\n(.*?)```", readme.read_text(), re.S)
    assert blocks, "README lost its quickstart code block"
    code = blocks[0]
    # provide the runtime inputs the snippet references
    ns = {
        "u0": jax.random.normal(jax.random.PRNGKey(0), (64, 64)),
        "k0": jnp.ones((64, 64)),
    }
    code = code.replace('lowering="pallas"', 'lowering="pallas", interpret=True')
    exec(compile(code, "README.md", "exec"), ns)
    assert ns["y"].shape == (64, 64)
    assert bool(jnp.all(jnp.isfinite(ns["grads"])))


def test_torch_module_source_structure():
    """Golden-ish checks for the TorchModule codegen path (reference
    test_module_printing parity for the torch side)."""
    import numpy as np

    from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields
    from pystencils_autodiff_tpu.backends.astnodes import TorchModule

    x, y = fields("x, y", 2)
    op = AutoDiffOp([Assignment(y.center, x[1, 0] - x[0, 0])], op_name="tm")
    mod = TorchModule("tmod", op)
    assert "forward" in mod.sources and "backward" in mod.sources
    assert "memset" in mod.sources["forward"]
    loaded = mod.compile()
    import torch

    out = loaded.call_forward(x=torch.randn(8, 8, dtype=torch.float64))
    assert out["y"].shape == (8, 8)
