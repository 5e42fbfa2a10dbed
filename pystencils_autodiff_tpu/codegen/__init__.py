"""Native code generation: C printer + g++ JIT (reference L3/L4 analog)."""

from .c_printer import generate_c_source, kernel_symbol_name
from .jit import cache_dir, compile_and_load, compile_shared_library, link

__all__ = [
    "generate_c_source",
    "kernel_symbol_name",
    "cache_dir",
    "compile_and_load",
    "compile_shared_library",
    "link",
]
