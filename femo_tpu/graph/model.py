"""Model composition: chained operations, FEA solves, output functionals.

Replacement for CSDL + python_csdl_backend + the reference's FEAModel /
StateModel / OutputModel stack (/root/reference/femo/csdl_opt/fea_model.py:5-38,
state_model.py, output_model.py).  Instead of a graph IR, a Model is an
ordered list of named operations executed eagerly on JAX arrays; the whole
composite is differentiable end-to-end by `jax.grad` because implicit solves
carry custom_vjp rules.  Variables are wired *by name*, like CSDL promotion.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config
from ..fea.assemble import compile_form
from ..fea.fea import FEA


@dataclass
class Operation:
    """A named op: fn(values_subset_dict) -> dict of outputs."""

    name: str
    fn: Callable
    inputs: list[str]
    outputs: list[str]


class Model:
    """Ordered eager computation over a dict of named arrays."""

    def __init__(self):
        self.operations: list[Operation] = []
        self.design_variables: dict[str, dict] = {}
        self.objective: dict | None = None
        self.constraints: dict[str, dict] = {}
        self.defaults: dict[str, jnp.ndarray] = {}

    # -- construction -----------------------------------------------------------
    def add_op(self, name: str, fn: Callable, inputs: Sequence[str],
               outputs: Sequence[str]):
        """fn takes positional arrays in `inputs` order, returns array or
        tuple matching `outputs`."""
        self.operations.append(
            Operation(name, fn, list(inputs), list(outputs)))
        return self

    def create_input(self, name: str, shape=None, val=0.0):
        """CSDL create_input parity: declares a default value."""
        if np.isscalar(val):
            if shape is None:
                raise ValueError("need shape for scalar default")
            val = np.full(shape if np.ndim(shape) == 0 else shape, val)
        self.defaults[name] = jnp.asarray(val, config.jdtype)
        return self

    def add_design_variable(self, name: str, lower=None, upper=None,
                            scaler=1.0, shape=None, val=None):
        if val is not None:
            self.create_input(name, shape, val)
        self.design_variables[name] = dict(
            lower=lower, upper=upper, scaler=scaler)

    def add_objective(self, name: str, scaler=1.0):
        self.objective = dict(name=name, scaler=scaler)

    def add_constraint(self, name: str, lower=None, upper=None, equals=None,
                       scaler=1.0):
        self.constraints[name] = dict(
            lower=lower, upper=upper, equals=equals, scaler=scaler)

    # -- execution ----------------------------------------------------------------
    def evaluate(self, values: dict | None = None) -> dict:
        """Run all operations; returns the full variable dict."""
        vals = dict(self.defaults)
        if values:
            vals.update(values)
        for op in self.operations:
            args = [vals[k] for k in op.inputs]
            out = op.fn(*args)
            if len(op.outputs) == 1:
                out = (out,)
            for k, v in zip(op.outputs, out):
                vals[k] = v
        return vals

    def __call__(self, values: dict | None = None) -> dict:
        return self.evaluate(values)


class FEAModel(Model):
    """Model auto-populated from a list of FEA problems (reference
    fea_model.py:9-38: one StateModel per state, one OutputModel per output).

    States and outputs become operations wired by argument names; chained
    problems (motor: mesh-motion state feeding the EM problem) work because
    both reference the same variable names.
    """

    def __init__(self, fea: list[FEA] | FEA, recorder=None):
        super().__init__()
        self.fea_list = [fea] if isinstance(fea, FEA) else list(fea)
        self.recorder = recorder
        for f in self.fea_list:
            self._add_fea(f)

    def _add_fea(self, fea: FEA):
        # defaults for declared inputs
        for iname, i in fea.inputs_dict.items():
            if iname not in self.defaults:
                self.defaults[iname] = i["function"].array

        for sname, s in fea.states_dict.items():
            def make_state_fn(fea=fea, sname=sname, s=s):
                def state_fn(*args):
                    op = fea._state_op(sname)
                    inputs = dict(zip(s["arguments"], args))
                    u0 = (s["function"].space.new_array(0.1)
                          if fea.initialize else s["function"].array)
                    u = op(inputs, u0)
                    # persist warm start + recorder hook (host side effects,
                    # suppressed under derivative tracing)
                    from .simulator import PURE_MODE

                    if not PURE_MODE.active:
                        s["function"].array = jax.lax.stop_gradient(u)
                        if self.recorder is not None and s["record"]:
                            self.recorder.write(
                                sname, s["function"], fea.opt_iter)
                    return u

                return state_fn

            self.add_op(f"{sname}_state_model", make_state_fn(),
                        s["arguments"], [sname])

        for oname, o in fea.outputs_dict.items():
            def make_out_fn(fea=fea, o=o):
                cf = compile_form(o["form"])
                coeff_names = list(o["form"].coeffs.keys())
                sj = cf.scalar_jit()

                def out_fn(*args):
                    named = dict(zip(o["arguments"], args))
                    vals = o["form"].values()
                    vals.update(
                        {k: v for k, v in named.items() if k in vals})
                    return sj(vals)

                return out_fn

            self.add_op(f"{oname}_output_model", make_out_fn(),
                        o["arguments"], [oname])

        for oname, o in fea.outputs_field_dict.items():
            def make_field_fn(fea=fea, oname=oname, o=o):
                from ..fea.project import project_form

                def field_fn(*args):
                    named = dict(zip(o["arguments"], args))
                    vals = o["form"].values()
                    vals.update(
                        {k: v for k, v in named.items() if k in vals})
                    arr = project_form(o["form"], o["func"].space, vals)
                    from .simulator import PURE_MODE

                    if not PURE_MODE.active:
                        o["func"].array = jax.lax.stop_gradient(arr)
                        if self.recorder is not None and o["record"]:
                            self.recorder.write(oname, o["func"], fea.opt_iter)
                    return arr

                return field_fn

            self.add_op(f"{oname}_field_output_model", make_field_fn(),
                        o["arguments"], [oname])
