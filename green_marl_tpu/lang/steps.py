"""Compile-step framework.

The reference drives its whole pipeline through ``gm_compile_step``
objects — a per-step class carrying a description, an ``okay`` flag and
an ``affected`` flag, instantiated per procedure through a factory and
sequenced by the frontend/optimizer/backend step lists
(``src/inc/gm_compile_step.h:1-66``, ``gm_frontend.cc`` /
``gm_ind_opt.cc`` ``prepare_steps``).  This module is the analog for
this compiler: :class:`CompileStep` objects with the same observable
protocol (name, description, ``okay``/``affected`` after a run), a
:func:`step` decorator/wrapper for plain ``proc -> proc`` pass
functions, and :class:`Pipeline` to sequence them with per-step error
capture and an execution trace (the ``gm_begin_minor_compiler_stage``
progress protocol).

Pass *functions* stay the unit of logic (idiomatic Python — a virtual
``process`` method adds nothing to a closure); the step object is the
metadata + sequencing shell around them, which is the part of the
reference design that carries value here.
"""

from __future__ import annotations

import copy
from typing import Callable, List, Optional, Sequence

from . import gm_ast as A


class CompileStep:
    """One named pipeline stage over a procedure AST."""

    name: str = "step"
    description: str = "compiler step"

    def __init__(self, name: Optional[str] = None,
                 description: Optional[str] = None):
        if name is not None:
            self.name = name
        if description is not None:
            self.description = description
        self.okay = True          # is_okay()
        self.affected = None      # has_affected(); None = not probed

    def process(self, proc: A.Procedure) -> A.Procedure:
        raise NotImplementedError

    def run(self, proc: A.Procedure,
            probe_affected: bool = False) -> A.Procedure:
        """Invoke ``process``; with ``probe_affected``, record
        ``affected`` by reproduced-source comparison (the reference
        leaves the flag to each step to set; a text probe needs no
        per-step cooperation and the reproducer is round-trip-stable,
        tests/test_lang.py).  The probe costs two full serializations
        per step, so the production compile path leaves it off and
        ``affected`` stays None there."""
        from .reproduce import reproduce
        before = reproduce([proc]) if probe_affected else None
        out = self.process(proc)
        self.affected = (reproduce([out]) != before) \
            if probe_affected else None
        return out

    def __call__(self, proc: A.Procedure) -> A.Procedure:
        """Steps stay callable like the bare pass function."""
        return self.process(proc)

    def get_instance(self) -> "CompileStep":   # factory protocol
        return copy.copy(self)

    def __repr__(self):
        return f"<CompileStep {self.name}: {self.description}>"


class FunctionStep(CompileStep):
    """Wrap a ``proc -> proc`` pass function as a step."""

    def __init__(self, name: str, fn: Callable[[A.Procedure],
                                               A.Procedure],
                 description: Optional[str] = None):
        super().__init__(name, description or (fn.__doc__ or "")
                         .strip().split("\n")[0])
        self.fn = fn

    def process(self, proc: A.Procedure) -> A.Procedure:
        return self.fn(proc)


def step(name: str, description: Optional[str] = None):
    """Decorator: ``@step("sugar2")`` turns a pass function into a
    :class:`FunctionStep` while leaving it callable as a function."""
    def wrap(fn):
        return FunctionStep(name, fn, description)
    return wrap


class Pipeline:
    """A sequenced list of steps with a run trace.

    ``run`` applies each step to each procedure (fresh step instance
    per procedure, as the reference's factory does), captures failures
    as ``okay=False`` instead of propagating when ``keep_going``, and
    records ``(step name, affected)`` per procedure in ``trace``.
    """

    def __init__(self, steps: Sequence[CompileStep]):
        self.steps = list(steps)
        self.trace: List[tuple] = []

    def names(self) -> List[str]:
        return [s.name for s in self.steps]

    def subset(self, names: Sequence[str]) -> "Pipeline":
        table = {s.name: s for s in self.steps}
        return Pipeline([table[n] for n in names])

    def run(self, proc: A.Procedure, keep_going: bool = False,
            probe_affected: bool = False) -> A.Procedure:
        for s in self.steps:
            inst = s.get_instance()
            try:
                proc = inst.run(proc, probe_affected=probe_affected)
            except Exception:
                inst.okay = False
                if not keep_going:
                    raise
            self.trace.append((proc.name if hasattr(proc, "name")
                               else "?", inst.name, inst.okay,
                               inst.affected))
        return proc

    def describe(self) -> str:
        """Human-readable step table (gmc ``-Dp``)."""
        w = max((len(s.name) for s in self.steps), default=4)
        return "\n".join(f"{s.name:<{w}}  {s.description}"
                         for s in self.steps)
