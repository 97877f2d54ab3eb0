from .delimited import read_multichar_delimited  # noqa: F401
from .jsonl import read_jsonl  # noqa: F401
from .writers import write_csv, write_partitioned_parquet  # noqa: F401
