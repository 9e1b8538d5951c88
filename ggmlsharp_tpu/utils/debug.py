"""Runtime checking helpers (SURVEY §5 "race detection/sanitizers": the
reference's only checking is Debug.Assert in debug builds; on TPU the
equivalents are jax.checkify for in-graph assertions and chex for shape/type
checks)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn, *, errors=checkify.user_checks):
    """Wrap a jittable fn so checkify.check assertions inside it surface as
    Python exceptions (the Debug.Assert analog that survives jit)."""
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def check(pred, msg: str, **fmt):
    """In-graph assertion (use inside a `checked`-wrapped function)."""
    checkify.check(pred, msg, **fmt)


def assert_all_finite(tree, name: str = "tree"):
    """Host-side NaN/Inf sweep over a pytree of arrays (debug tool)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if leaf is None or not hasattr(leaf, "dtype"):
            continue
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
    return True


def print_objects(tree, name: str = "params") -> str:
    """ggml_print_objects analog (Ggml.cs:2327-2345): instead of walking an
    arena's object list, summarize a pytree's arrays (shape, dtype, bytes)."""
    from ..quant.formats import QTensor

    lines = [f"=== {name} ==="]
    total = 0

    def walk(node, path):
        nonlocal total
        if isinstance(node, QTensor):
            nb = sum(p.size * p.dtype.itemsize for p in node.planes.values())
            total += nb
            lines.append(
                f" - {path:<40} QTensor[{node.gtype.name}] {node.shape} "
                f"({nb/1e6:.2f} MB packed)"
            )
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}.{k}" if path else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{path}[{i}]")
        elif node is None:
            lines.append(f" - {path:<40} None")
        else:
            nb = node.size * node.dtype.itemsize
            total += nb
            lines.append(
                f" - {path:<40} {str(node.dtype):<10} {tuple(node.shape)} "
                f"({nb/1e6:.2f} MB)"
            )

    walk(tree, "")
    lines.append(f"total: {total/1e6:.2f} MB")
    out = "\n".join(lines)
    print(out)
    return out
