"""Declarative pipeline spec.

The reference's unit of work is an SSIS *package*: connections + SQL tasks +
data flows + an execution order of precedence-constrained tasks
(``/root/reference/models.py:89-95``, parser output
``parsing/data_engineering_parser.py:53-59``). Each data flow is a DAG of
components joined by paths (``:413-444``).

Our equivalent is a :class:`Pipeline` of :class:`Step` nodes. A step names an
operator from the registry, a config dict, and its input edges. Multi-output
operators (conditional split, lookup match/no-match) expose named output
ports addressed as ``"step.port"``; single-output steps are addressed by the
bare step name. The runner topo-sorts and executes — all laziness is
Catalyst's (nothing materializes until a sink or an explicit action).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class Step:
    """One operator instance (reference: SSISComponent, models.py:60-68)."""

    name: str
    op: str
    inputs: list[str] = field(default_factory=list)  # "step" or "step.port"
    config: dict[str, Any] = field(default_factory=dict)
    enabled: bool = True  # DTS:Disabled handling (parser :197-200)


@dataclass
class Pipeline:
    """A DAG of steps + driver-side scalar variables (SSIS package variables,

    models.py:85; written by e.g. Row Count and read by precedence-constraint
    expression guards, Sample_Medium_Package.dtsx:905).
    """

    name: str
    steps: list[Step] = field(default_factory=list)
    variables: dict[str, Any] = field(default_factory=dict)

    def step(
        self,
        name: str,
        op: str,
        inputs: list[str] | str | None = None,
        **config: Any,
    ) -> "Pipeline":
        """Builder-style append; returns self for chaining."""
        if isinstance(inputs, str):
            inputs = [inputs]
        self.steps.append(Step(name=name, op=op, inputs=inputs or [], config=config))
        return self

    def to_dict(self) -> dict[str, Any]:
        """JSON-able spec (the declarative-pipeline analogue of the
        reference's parsed-package JSON IR, data_engineering_parser.py:53-59).
        Only JSON-able configs round-trip — use string SSIS expressions, not
        Column objects, in pipelines meant for serialization."""
        return {
            "name": self.name,
            "variables": dict(self.variables),
            "steps": [
                {
                    "name": s.name,
                    "op": s.op,
                    "inputs": list(s.inputs),
                    "config": s.config,
                    "enabled": s.enabled,
                }
                for s in self.steps
            ],
        }

    def to_dot(self) -> str:
        """Graphviz DOT of the step DAG (column-level lineage is Catalyst's
        job — ``df.explain`` — but step-level lineage is part of the spec,
        matching the reference's path/lineage tracking,
        data_engineering_parser.py:413-444)."""
        lines = [f'digraph "{self.name}" {{', "  rankdir=LR;"]
        for s in self.steps:
            shape = (
                "cylinder"
                if s.op.startswith(("source.", "sink."))
                else "box"
            )
            style = "" if s.enabled else ' style=dashed'
            lines.append(f'  "{s.name}" [label="{s.name}\\n{s.op}" shape={shape}{style}];')
        for s in self.steps:
            for ref in s.inputs:
                src, _, port = ref.partition(".")
                label = f' [label="{port}"]' if port else ""
                lines.append(f'  "{src}" -> "{s.name}"{label};')
        lines.append("}")
        return "\n".join(lines)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Pipeline":
        p = cls(name=d["name"], variables=dict(d.get("variables", {})))
        for s in d.get("steps", []):
            p.steps.append(
                Step(
                    name=s["name"],
                    op=s["op"],
                    inputs=list(s.get("inputs", [])),
                    config=dict(s.get("config", {})),
                    enabled=s.get("enabled", True),
                )
            )
        return p

    def validate(self) -> None:
        names = set()
        for s in self.steps:
            if s.name in names:
                raise ValueError(f"duplicate step name {s.name!r}")
            names.add(s.name)
        for s in self.steps:
            for ref in s.inputs:
                if ref.split(".")[0] not in names:
                    raise ValueError(
                        f"step {s.name!r} references unknown input {ref!r}"
                    )
