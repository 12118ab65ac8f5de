from .backend import (  # noqa: F401
    CasLeaseLock,
    CasObjectStoreBackend,
    PosixBackend,
    StorageBackend,
    resolve_backend,
)
from .partitioning import PartitionExpr, parse_partition_exprs  # noqa: F401
from .table import LakeCatalog, LakeTable  # noqa: F401
from .txn import TxnInProgress  # noqa: F401
from .writer import ConstraintViolation, LakeWriter  # noqa: F401
