"""Central registry: every named query/operator the engine exposes.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this list. Names follow SURVEY.md §2 Op ids; extensions use
``dedup_* / sim_* / text_* / mm_* / stream_*`` prefixes.
"""

from __future__ import annotations

from .plans.candidate_parts import CANDIDATE_PARTS_ORACLE, candidate_parts
from .spec import QuerySpec

SPECS: list[QuerySpec] = [
    QuerySpec(
        name="candidate_parts",
        fn=candidate_parts,
        oracle=CANDIDATE_PARTS_ORACLE,
        doc="Flagship 6-step multi-hop traversal (x2.2.py:238-247 analog).",
        tags=("core", "flagship"),
    ),
]


def _extend(specs: list[QuerySpec]) -> None:
    seen = {s.name for s in SPECS}
    for s in specs:
        if s.name in seen:
            raise ValueError(f"duplicate query name {s.name}")
        seen.add(s.name)
        SPECS.append(s)


def _load_all() -> None:
    """Import operator modules lazily so a syntax error in one module
    doesn't take down the whole surface during development."""
    from .operators import relational  # noqa: PLC0415

    _extend(relational.SPECS)
    from .operators import sources_sinks  # noqa: PLC0415

    _extend(sources_sinks.SPECS)
    from .operators import composite  # noqa: PLC0415

    _extend(composite.SPECS)
    from .operators import tpch_extra  # noqa: PLC0415

    _extend(tpch_extra.SPECS)
    from .operators import storage  # noqa: PLC0415

    _extend(storage.SPECS)
    from .operators import sql_surface  # noqa: PLC0415

    _extend(sql_surface.SPECS)
    from .operators import temporal  # noqa: PLC0415

    _extend(temporal.SPECS)
    from .operators import windows  # noqa: PLC0415

    _extend(windows.SPECS)
    from .operators import functions_surface  # noqa: PLC0415

    _extend(functions_surface.SPECS)
    from .operators import dedup  # noqa: PLC0415

    _extend(dedup.SPECS)
    from .operators import similarity  # noqa: PLC0415

    _extend(similarity.SPECS)
    from .operators import text_analysis  # noqa: PLC0415

    _extend(text_analysis.SPECS)
    from .operators import sampling  # noqa: PLC0415

    _extend(sampling.SPECS)
    from .operators import multimodal  # noqa: PLC0415

    _extend(multimodal.SPECS)
    from .operators import graph  # noqa: PLC0415

    _extend(graph.SPECS)
    from .operators import quality  # noqa: PLC0415

    _extend(quality.SPECS)
    from .operators import llm_prep  # noqa: PLC0415

    _extend(llm_prep.SPECS)
    from .operators import analytics_extra  # noqa: PLC0415

    _extend(analytics_extra.SPECS)
    from .plans import pipeline  # noqa: PLC0415

    _extend(pipeline.SPECS)
    from .plans import corpus_prep  # noqa: PLC0415

    _extend(corpus_prep.SPECS)
    from .plans import cc_clusters  # noqa: PLC0415

    _extend(cc_clusters.SPECS)
    from .streaming import jobs  # noqa: PLC0415

    _extend(jobs.SPECS)


_load_all()


def get(name: str) -> QuerySpec:
    for s in SPECS:
        if s.name == name:
            return s
    raise KeyError(name)
