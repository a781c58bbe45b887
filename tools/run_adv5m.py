"""One-shot round-5 runner: the adversarial (Zipf+boilerplate) probe
sweep at 5M docs (round-4 verdict item 4 — one decade past the 1M runs).
Kept as a file so the run is reproducible: `python tools/run_adv5m.py`."""
import sys

sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

from scale_probe import probe_adversarial  # noqa: E402

from ssis_to_pyspark_agent_spark.session import get_spark  # noqa: E402

spark = get_spark(
    app_name="adv5m", extra_conf={"spark.ui.showConsoleProgress": "false"}
)
probe_adversarial(spark, n_docs=5_000_000)
print("ALL DONE")
