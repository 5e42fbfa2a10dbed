"""Recorded call-graph datahandling: capture a simulation as a replayable
program.

Rebuild of the reference's ``graph_datahandling.py`` (SURVEY.md §2.1 #14):
there, a pystencils ``DataHandling`` proxy records every call — field
allocations, sweeps, ghost-layer communication, timeloops — so the whole
program can later be code-generated as a waLBerla C++ app.  The TPU-native
equivalent records the same call graph and "generates the program" by
compiling it into ONE jit-able, differentiable step/run function; because
the graph is explicit, whole-program optimization is mechanical:

* ``compile(fuse="none")``   — replay nodes as-is (one kernel per sweep),
* ``compile(fuse="symbolic")`` — inline the sweep chain into a single
  symbolic op (compose.py; one kernel per *step*),
* ``compile(fuse="stages", k=…)`` — fuse ``k`` whole timeloop cycles into
  one Pallas kernel (ops/stage_chain.py) — the recorded graph is exactly
  the stage list the heterogeneous chain needs.

``describe()`` renders the recorded graph as indented text and
``to_dict()`` as a JSON-able spec — the inspectable "generated program"
artifact standing in for the reference's emitted C++ main().
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from .boundary import BoundaryHandling
from .datahandling import DataHandling
from .timeloop import run_timeloop

__all__ = ["GraphDataHandling", "CallGraph",
           "AllocNode", "SweepNode", "BoundaryNode", "CommNode",
           "TimeloopNode"]

State = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# Graph nodes
# ---------------------------------------------------------------------------

@dataclass
class AllocNode:
    name: str
    index_shape: tuple
    dtype: str
    init: float

    def describe(self) -> str:
        idx = f" x{list(self.index_shape)}" if self.index_shape else ""
        return f"alloc {self.name}{idx} : {self.dtype} = {self.init}"

    def spec(self):
        return {"kind": "alloc", "name": self.name,
                "index_shape": list(self.index_shape),
                "dtype": self.dtype, "init": self.init}


@dataclass
class SweepNode:
    op: object  # AutoDiffOp
    carry_map: Dict[str, str]

    def describe(self) -> str:
        reads = sorted(f.name for f in self.op.forward_input_fields)
        writes = sorted(f.name for f in self.op.forward_output_fields)
        carry = ", ".join(f"{d}<-{s}" for d, s in sorted(self.carry_map.items()))
        return (f"sweep {self.op.op_name}: reads {reads} writes {writes} "
                f"carry [{carry}]")

    def spec(self):
        from .ops import forward_program

        prog = forward_program(self.op)
        return {"kind": "sweep", "op": self.op.op_name,
                "reads": sorted(prog.input_names),
                "writes": sorted(prog.output_names),
                "ghost": [list(g) for g in prog.ghost],
                "carry": dict(self.carry_map)}


@dataclass
class BoundaryNode:
    handler: BoundaryHandling

    def describe(self) -> str:
        kinds = {n: "+".join(k for k, *_ in chain)
                 for n, chain in self.handler.specs.items()}
        return f"boundary {kinds}"

    def spec(self):
        return {"kind": "boundary",
                "fields": {n: [k for k, *_ in chain]
                           for n, chain in self.handler.specs.items()}}


@dataclass
class CommNode:
    """Ghost-layer communication point.  On a device mesh this is where the
    reference's waLBerla scheme would exchange MPI halos; here sharded
    sweeps exchange halos internally (parallel/halo.py ppermute), so the
    node records the *intent* and is a no-op at replay on one device."""
    fields: List[str]

    def describe(self) -> str:
        return f"communicate ghost layers: {self.fields}"

    def spec(self):
        return {"kind": "comm", "fields": list(self.fields)}


@dataclass
class TimeloopNode:
    body: List[object] = dc_field(default_factory=list)

    def describe(self) -> str:
        inner = "\n".join("  " + n.describe() for n in self.body)
        return f"timeloop:\n{inner}"

    def spec(self):
        return {"kind": "timeloop", "body": [n.spec() for n in self.body]}


@dataclass
class CallGraph:
    nodes: List[object] = dc_field(default_factory=list)

    def describe(self) -> str:
        return "\n".join(n.describe() for n in self.nodes)

    def to_dict(self):
        return {"nodes": [n.spec() for n in self.nodes]}

    def to_json(self, **kw) -> str:
        return json.dumps(self.to_dict(), **kw)


# ---------------------------------------------------------------------------
# Recording datahandling
# ---------------------------------------------------------------------------

class GraphDataHandling(DataHandling):
    """A ``DataHandling`` that records its call graph for whole-program
    compilation (reference ``graph_datahandling.py``, SURVEY.md §2.1 #14).

    Example::

        dh = GraphDataHandling((64, 64), ghost_layers=1)
        dh.add_field("u", init=0.0)
        with dh.timeloop() as loop:
            loop.boundary({"u": "neumann"})
            loop.sweep(heat_op, {"u": "u_next"})
        run = dh.compile()                       # or fuse="symbolic"/"stages"
        final = run(dh.state(), n_steps=100)
        print(dh.graph.describe())               # the recorded program
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.graph = CallGraph()
        self._loop: Optional[TimeloopNode] = None

    # -- recording wrappers ---------------------------------------------------

    def add_field(self, name, index_shape=(), dtype=None, init=0.0,
                  origin=None):
        f = super().add_field(name, index_shape, dtype=dtype, init=init,
                              origin=origin)
        # record a scalar init when possible; array-valued inits (which the
        # underlying DataHandling accepts) get a shape placeholder so the
        # artifact stays JSON-serialisable (advisor finding, round 2)
        try:
            init_rec = float(init)
        except (TypeError, ValueError):
            shape = getattr(init, "shape", None)
            init_rec = (f"array{tuple(shape)}" if shape is not None
                        else "array")
        self.graph.nodes.append(AllocNode(
            name, tuple(index_shape), str(self.arrays[name].dtype),
            init_rec))
        return f

    def _record(self, node):
        (self._loop.body if self._loop is not None
         else self.graph.nodes).append(node)
        return node

    def run_boundary(self, specs):
        self._record(BoundaryNode(BoundaryHandling(self.ghost, specs)))

    def run_sweep(self, op, carry_map: Dict[str, str]):
        self._record(SweepNode(op, dict(carry_map)))

    def communicate(self, *field_names: str):
        self._record(CommNode(list(field_names) or sorted(self.fields)))

    def timeloop(self):
        """Context manager recording a timeloop body."""
        dh = self

        class _Loop:
            def __enter__(self):
                dh._loop = TimeloopNode()
                dh.graph.nodes.append(dh._loop)
                return self

            def __exit__(self, *exc):
                dh._loop = None
                return False

            def boundary(self, specs):
                dh.run_boundary(specs)

            def sweep(self, op, carry_map):
                dh.run_sweep(op, carry_map)

            def communicate(self, *names):
                dh.communicate(*names)

        return _Loop()

    # -- whole-program compilation ---------------------------------------------

    def _timeloop_node(self) -> TimeloopNode:
        loops = [n for n in self.graph.nodes if isinstance(n, TimeloopNode)]
        if len(loops) != 1:
            raise ValueError(f"need exactly one recorded timeloop, "
                             f"have {len(loops)}")
        return loops[0]

    def _step_fn(self, body: List[object], lowering: str, mesh=None,
                 dim_axes=None, **kwargs) -> Callable[[State], State]:
        from .ops.stage_chain import stage_stepper

        parts = []
        for node in body:
            if isinstance(node, BoundaryNode):
                bh = node.handler

                def bc(state, _bh=bh):
                    return {**state, **{n: _bh.apply(n, state[n])
                                        for n in _bh.specs if n in state}}
                parts.append(bc)
            elif isinstance(node, SweepNode):
                fn = None
                if mesh is not None:
                    # mesh-decomposed sweep: shard_map + ppermute halo
                    # exchange replaces the reference's generated-MPI-app
                    # execution of the recorded graph (SURVEY §2.1 #13-15)
                    from .parallel import ShardedStencil

                    fn = ShardedStencil(node.op, mesh, dim_axes or {0: mesh.axis_names[0]},
                                        **kwargs)
                parts.append(stage_stepper(node.op, node.carry_map,
                                           lowering=lowering, fn=fn,
                                           **({} if fn is not None else kwargs)))
            elif isinstance(node, CommNode):
                pass  # sharded sweeps exchange halos internally
            else:
                raise ValueError(f"unsupported node in timeloop: {node}")

        def step(state: State) -> State:
            for p in parts:
                state = p(state)
            return state

        return step

    def compile(self, fuse: str = "none", k: int = 1, lowering: str = "jnp",
                checkpoint: str = "none", **kwargs):
        """Compile the recorded graph to ``run(state, n_steps) -> state``.

        ``fuse="none"``: replay node-by-node (reference semantics).
        ``fuse="symbolic"``: compose the sweep chain into one op
        (Simulation.fused_op machinery via compose.py).
        ``fuse="stages"``: run the whole timeloop body as a heterogeneous
        fused chain, ``k`` cycles per kernel (boundary nodes must be
        absent or periodic — the chain handles wrap itself).

        ``mesh=``/``dim_axes=``: run the recorded graph mesh-decomposed —
        with ``fuse='none'`` every sweep runs via ``parallel.ShardedStencil``
        (shard_map + ppermute halo exchange each step, the way the
        reference's generated waLBerla/MPI app would run it); with
        ``fuse='stages'`` the whole body runs as a comm-avoiding
        ``parallel.ShardedChain`` (ONE k·reach-deep halo exchange per fused
        k-cycle kernel).  Fully differentiable either way.  Not supported
        with fuse='symbolic'.
        """
        if kwargs.get("mesh") is not None and fuse == "symbolic":
            raise ValueError("mesh-decomposed execution supports "
                             "fuse='none' and fuse='stages'")
        body = self._timeloop_node().body
        if fuse == "none":
            step = self._step_fn(body, lowering, **kwargs)

            def run(state: State, n_steps: int) -> State:
                return run_timeloop(step, state, n_steps,
                                    checkpoint=checkpoint)

            run.step = step
            run.steps_per_call = 1
            return run
        if fuse == "stages":
            from .ops.stage_chain import fused_stage_chain

            periodic = kwargs.pop("periodic", False)
            # recorded BoundaryNodes fold into the fused chain as per-stage
            # BC events (ops/chain_bc.py); inline arrays in the recorded
            # specs become synthetic pass-through state fields
            sweeps: List[SweepNode] = []
            boundary: Dict[int, dict] = {}
            const_arrays: Dict[str, object] = {}
            n_synth = 0

            def register_arr(arr):
                nonlocal n_synth
                name = f"_bc_arr{n_synth}"
                n_synth += 1
                a = jnp.asarray(arr)
                if a.dtype == bool:
                    a = a.astype(jnp.float32)
                const_arrays[name] = a
                return name

            def as_chain_args(kind, args, kw):
                if kw and (kind != "bounce_back" or set(kw) != {"wrap"}):
                    raise ValueError(
                        f"recorded BC {kind!r} keyword arguments {sorted(kw)} "
                        f"cannot fuse into a chain")
                if kind == "bounce_back" and "wrap" in kw \
                        and bool(kw["wrap"]) != bool(periodic):
                    raise ValueError(
                        "recorded bounce_back(wrap=%r) conflicts with "
                        "compile(periodic=%r): fused chains wrap "
                        "out-of-domain pulls exactly when the chain domain "
                        "is periodic" % (kw["wrap"], periodic))
                if kind in ("dirichlet", "neumann"):
                    return (kind, *args)
                if kind == "masked_dirichlet":
                    mask = register_arr(args[0])
                    rest = [register_arr(a) if hasattr(a, "shape")
                            and getattr(a, "ndim", 0) > 0 else a
                            for a in args[1:]]
                    return (kind, mask, *rest)
                if kind == "sponge":
                    damp = (register_arr(args[0])
                            if getattr(args[0], "ndim", 0) > 0
                            else float(args[0]))
                    return (kind, damp)
                if kind == "bounce_back":
                    mask = register_arr(args[0])
                    rest = list(args[1:])
                    if rest and rest[0] is not None:
                        rest[0] = tuple(
                            register_arr(u) if getattr(u, "ndim", 0) > 0
                            else float(u) for u in rest[0])
                    return (kind, mask, *rest)
                raise ValueError(
                    f"recorded BC kind {kind!r} cannot fuse into a chain "
                    f"(periodic domains: pass periodic=True instead)")

            pending_bcs: List[tuple] = []
            for node in body:
                if isinstance(node, SweepNode):
                    if pending_bcs:
                        stage_specs = boundary.setdefault(len(sweeps), {})
                        for fname, chain_list in pending_bcs:
                            specs = stage_specs.setdefault(fname, [])
                            specs.extend(chain_list)
                        pending_bcs = []
                    sweeps.append(node)
                elif isinstance(node, BoundaryNode):
                    for fname, chain_list in node.handler.specs.items():
                        pending_bcs.append((fname, [
                            as_chain_args(kind, bargs, bkw)
                            for kind, bargs, bkw in chain_list]))
                elif isinstance(node, CommNode):
                    pass  # chains exchange halos internally
                else:
                    raise ValueError(f"unsupported node in timeloop: {node}")
            if pending_bcs:
                raise ValueError(
                    "fuse='stages': a recorded boundary node after the last "
                    "sweep has no following stage to attach to — record "
                    "boundaries before the sweep they prepare")
            mesh = kwargs.pop("mesh", None)
            if mesh is not None:
                from .parallel import ShardedChain

                dim_axes = kwargs.pop("dim_axes", None)
                chain = ShardedChain(
                    [(s.op, s.carry_map) for s in sweeps], k=k, mesh=mesh,
                    dim_axes=dim_axes or {0: mesh.axis_names[0]},
                    periodic=periodic, boundary=boundary or None, **kwargs)
            else:
                chain = fused_stage_chain(
                    [(s.op, s.carry_map) for s in sweeps],
                    k=k, periodic=periodic, boundary=boundary or None,
                    **kwargs)
            chain_fields = set(chain.input_names) - set(const_arrays)

            def run(state: State, n_steps: int) -> State:
                if n_steps % k:
                    raise ValueError(f"n_steps={n_steps} not divisible by "
                                     f"chain depth k={k}")

                def bodyf(c, _):
                    # extra (non-chain) state fields pass through untouched,
                    # matching fuse='none' semantics; synthetic BC arrays
                    # ride the chain but never enter the carried state
                    inner = {n: c[n] for n in c if n in chain_fields}
                    inner.update({n: jnp.asarray(a, next(
                        iter(inner.values())).dtype)
                        for n, a in const_arrays.items()})
                    out = chain(inner)
                    out = {n: v for n, v in out.items()
                           if n not in const_arrays}
                    return {**c, **out}, None

                out, _ = jax.lax.scan(bodyf, dict(state), None,
                                      length=n_steps // k)
                return out

            run.step = lambda c: bodyf_step(c)

            def bodyf_step(c):
                inner = {n: c[n] for n in c if n in chain_fields}
                inner.update({n: jnp.asarray(a, next(
                    iter(inner.values())).dtype)
                    for n, a in const_arrays.items()})
                out = chain(inner)
                out = {n: v for n, v in out.items() if n not in const_arrays}
                return {**c, **out}

            run.steps_per_call = k
            return run
        if fuse == "symbolic":
            from .simulation import Simulation

            # the fused sweep replaces the recorded sweeps IN PLACE: the
            # sweeps must be contiguous (no boundary node between them, or
            # fusing would reorder BC application vs the recorded program)
            sweep_pos = [j for j, n in enumerate(body)
                         if isinstance(n, SweepNode)]
            if sweep_pos and sweep_pos != list(
                    range(sweep_pos[0], sweep_pos[0] + len(sweep_pos))):
                raise ValueError(
                    "fuse='symbolic' needs the recorded sweeps to be "
                    "contiguous; a boundary/comm node between sweeps would "
                    "be reordered by fusion — use fuse='none'")
            sim = Simulation(self, lowering=lowering, **kwargs)
            for n in body:
                if isinstance(n, SweepNode):
                    sim.add_sweep(n.op, n.carry_map)
            fused = sim.fused_op()
            carry = fused._fused_carry
            new_body, placed = [], False
            for n in body:
                if isinstance(n, SweepNode):
                    if not placed:
                        new_body.append(SweepNode(fused, carry))
                        placed = True
                elif isinstance(n, BoundaryNode):
                    new_body.append(n)
            step = self._step_fn(new_body, lowering, **kwargs)

            def run(state: State, n_steps: int) -> State:
                return run_timeloop(step, state, n_steps,
                                    checkpoint=checkpoint)

            run.step = step
            run.steps_per_call = 1
            return run
        raise ValueError(f"unknown fuse mode {fuse!r}; "
                         f"have 'none', 'symbolic', 'stages'")
