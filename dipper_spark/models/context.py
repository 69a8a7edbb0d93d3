"""Family / Environment / Reference emitters — the remaining model macros.

Reference: dipper/models/Family.py:22-42 (has-member / member-of mereology),
dipper/models/Environment.py:30-80 (environment + condition individuals,
has_part composition), dipper/models/Reference.py:95-122 (typed publication
individuals with title/short-citation labels).

Same contract as every emitter in this package: pure
``DataFrame[entities] -> DataFrame[triples]`` — select/union only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dipper_spark.core.triples import make_triples, union_graphs
from dipper_spark.models import terms as T
from dipper_spark.models.model import individual_triples

HAS_MEMBER = "RO:0002351"
MEMBER_OF = "RO:0002350"
ENVIRONMENTAL_SYSTEM = "ENVO:01000254"
ENVIRONMENTAL_CONDITION = "XCO:0000000"
TITLE = "dc:title"


def family_triples(
    df: DataFrame,
    group_col: str = "group_id",
    member_col: str = "member_id",
    *,
    both_directions: bool = False,
    graph_id: str | None = None,
) -> DataFrame:
    """Family.addMember (+ addMemberOf when both_directions)."""
    parts = [
        make_triples(df, group_col, F.lit(HAS_MEMBER), member_col, is_literal=False, graph_id=graph_id)
    ]
    if both_directions:
        parts.append(
            make_triples(df, member_col, F.lit(MEMBER_OF), group_col, is_literal=False, graph_id=graph_id)
        )
    return union_graphs(*parts)


def environment_triples(
    df: DataFrame,
    env_col: str = "env_id",
    label_col: str | None = "env_label",
    *,
    env_type: str | Column = ENVIRONMENTAL_SYSTEM,
    component_col: str | None = None,
    graph_id: str | None = None,
) -> DataFrame:
    """Environment.addEnvironment (+ addComponentToEnvironment when a
    component column is given)."""
    type_col = F.lit(env_type) if isinstance(env_type, str) else env_type
    parts = [individual_triples(df, env_col, type_col, label_col=label_col, graph_id=graph_id)]
    if component_col is not None:
        parts.append(
            make_triples(
                df.filter(F.col(component_col).isNotNull()),
                env_col, F.lit(T.HAS_PART), component_col, is_literal=False, graph_id=graph_id,
            )
        )
    return union_graphs(*parts)


def environmental_condition_triples(
    df: DataFrame,
    cond_col: str = "cond_id",
    label_col: str | None = "cond_label",
    *,
    cond_type: str | Column = ENVIRONMENTAL_CONDITION,
    graph_id: str | None = None,
) -> DataFrame:
    """Environment.addEnvironmentalCondition."""
    type_col = F.lit(cond_type) if isinstance(cond_type, str) else cond_type
    return individual_triples(df, cond_col, type_col, label_col=label_col, graph_id=graph_id)


def reference_triples(
    df: DataFrame,
    ref_col: str = "ref_id",
    *,
    type_col: str | Column = "IAO:0000311",  # publication
    citation_col: str | None = None,
    title_col: str | None = None,
    graph_id: str | None = None,
) -> DataFrame:
    """Reference.addRefToGraph: typed publication individual, short citation
    as label, full title as dc:title."""
    tcol = F.lit(type_col) if isinstance(type_col, str) else type_col
    parts = [
        individual_triples(df, ref_col, tcol, label_col=citation_col, graph_id=graph_id)
    ]
    if title_col is not None:
        parts.append(
            make_triples(
                df.filter(F.col(title_col).isNotNull()),
                ref_col, F.lit(TITLE), title_col, is_literal=True, graph_id=graph_id,
            )
        )
    return union_graphs(*parts)
