"""SQL-script entry points (reference UX parity).

The reference is driven by file-submitted SQL
(`sql-client.sh -f flink_job.sql`, `/root/reference/README.md:81,85`);
this package gives the Spark engine the same surface: `.sql` scripts
in Spark dialect plus a quote/comment-aware runner
(`runner.run_script`). The shipped scripts are the reference's two
jobs re-expressed over engine-registered views, equivalence-tested
against the DataFrame builders (the semantic spec) in
tests/test_sql_scripts.py.
"""

from .runner import run_script, split_statements  # noqa: F401
