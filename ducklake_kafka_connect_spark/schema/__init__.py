from .inference import infer_schema_from_value, infer_unified_schema  # noqa: F401
from .merge import SchemaUnificationError, unify_schemas, unify_types  # noqa: F401
from .reconcile import (  # noqa: F401
    EvolutionDecision,
    ReconcileError,
    plan_evolution,
    reconcile_schemas,
)
