"""Array-like ⇄ Field coercion (parity: reference
``field_tensor_conversion.py``, SURVEY.md §2.1 #8).

Accepts numpy arrays, jax arrays, torch tensors and tensorflow tensors and
builds the matching symbolic ``Field``; plus constructors going the other
way (``torch_tensor_from_field``, ``tf_variable_from_field``, ...).  In the
JAX-native world most of this glue vanishes (pytrees of jax.Arrays pass
straight through), but the helpers are kept for users migrating from the
reference's torch/TF workflows.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .field import Field

__all__ = [
    "ArrayWrapper",
    "is_array_like",
    "create_field_from_array_like",
    "coerce_to_field",
    "to_numpy",
    "torch_tensor_from_field",
    "tf_constant_from_field",
    "tf_variable_from_field",
    "tf_placeholder_from_field",
]


class ArrayWrapper:
    """Wrap an array with field annotations (index_dimensions, layout) that
    plain ndarrays cannot carry (reference ≈L120)."""

    def __init__(self, array, index_dimensions: int = 0, layout="c"):
        self.array = array
        self.index_dimensions = index_dimensions
        self.layout = layout

    def __array__(self, dtype=None):
        return np.asarray(self.array, dtype=dtype)

    @property
    def shape(self):
        return tuple(self.array.shape)

    @property
    def dtype(self):
        return self.array.dtype


def _dtype_of(array) -> np.dtype:
    dt = getattr(array, "dtype", None)
    if dt is None:
        return np.dtype("float64")
    s = str(dt)
    if s.startswith("torch."):
        s = s[len("torch."):]
    if s == "bfloat16":
        # numpy has no bfloat16; track as float32 symbolically
        s = "float32"
    if s.startswith("<dtype: "):  # tf dtype repr
        s = s[len("<dtype: "):].strip("'>")
    return np.dtype(s)


def is_array_like(obj) -> bool:
    if isinstance(obj, ArrayWrapper):
        return True
    return hasattr(obj, "shape") and hasattr(obj, "dtype") and not isinstance(obj, Field)


def create_field_from_array_like(name: str, array, index_dimensions: Optional[int] = None,
                                 layout="c") -> Field:
    """Infer a symbolic Field from any array-like (numpy / jax / torch / tf).

    ``index_dimensions`` splits trailing dims into per-cell components
    (e.g. 1 for a vector field stored as (..., 3)).
    """
    if isinstance(array, ArrayWrapper):
        index_dimensions = array.index_dimensions if index_dimensions is None else index_dimensions
        layout = array.layout
        array = array.array
    if index_dimensions is None:
        index_dimensions = 0
    shape = tuple(int(s) for s in array.shape)
    sd = len(shape) - index_dimensions
    if sd <= 0:
        raise ValueError(f"array rank {len(shape)} too small for "
                         f"{index_dimensions} index dimensions")
    return Field(name, sd, index_shape=shape[sd:], dtype=_dtype_of(array), layout=layout)


def coerce_to_field(name: str, obj) -> Field:
    if isinstance(obj, Field):
        return obj
    if is_array_like(obj):
        return create_field_from_array_like(name, obj)
    raise TypeError(f"cannot coerce {type(obj)} to Field")


def to_numpy(array) -> np.ndarray:
    """Host-side numpy view/copy of any supported array type."""
    if hasattr(array, "detach"):  # torch
        return array.detach().cpu().numpy()
    if type(array).__module__.startswith("tensorflow"):
        return array.numpy()
    return np.asarray(array)


def torch_tensor_from_field(field: Field, spatial_shape, requires_grad: bool = False,
                            cuda: bool = False):
    import torch

    shape = tuple(spatial_shape) + field.index_shape
    dt = getattr(torch, field.dtype.name, torch.float64)
    t = torch.zeros(*shape, dtype=dt)
    if cuda and torch.cuda.is_available():
        t = t.cuda()
    t.requires_grad_(requires_grad)
    return t


def tf_constant_from_field(field: Field, spatial_shape, init=0):
    import tensorflow as tf

    shape = tuple(spatial_shape) + field.index_shape
    return tf.constant(init, dtype=field.dtype.name, shape=shape, name=field.name)


def tf_variable_from_field(field: Field, spatial_shape, init=0):
    import tensorflow as tf

    shape = tuple(spatial_shape) + field.index_shape
    return tf.Variable(tf.fill(shape, tf.constant(init, dtype=field.dtype.name)),
                       name=field.name)


def tf_placeholder_from_field(field: Field, spatial_shape):
    """TF1-style placeholders are gone in TF2; keep the reference's API name
    but return a keras Input-like spec."""
    import tensorflow as tf

    shape = tuple(spatial_shape) + field.index_shape
    return tf.TensorSpec(shape=shape, dtype=field.dtype.name, name=field.name)
