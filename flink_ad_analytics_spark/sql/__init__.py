"""SQL-script entry points (reference UX parity).

The reference is driven by file-submitted SQL
(`sql-client.sh -f flink_job.sql`, `/root/reference/README.md:81,85`);
this package gives the Spark engine the same surface: `.sql` scripts
in Spark dialect plus a quote/comment-aware runner
(`runner.run_script`). The shipped scripts are the reference's two
jobs re-expressed over engine-registered views, equivalence-tested
against the DataFrame builders (the semantic spec) in
tests/test_sql_scripts.py.

Round 3 removes even the porting step: `flink_dialect.translate_script`
/ `flink_dialect.run_batch` execute the reference's VERBATIM Flink SQL
(TUMBLE windows, TO_TIMESTAMP_LTZ, WATERMARK DDL, STATEMENT SET,
Kafka-connector DDL bound to engine relations) -- both reference jobs
run untouched and value-equal to the native operators
(tests/test_flink_dialect.py).
"""

from .flink_dialect import run_batch, translate_script  # noqa: F401
from .runner import run_script, split_statements  # noqa: F401
