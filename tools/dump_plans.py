"""Dump `.explain("formatted")` for named bench/registry queries into
plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence files).

Usage:
    python tools/dump_plans.py r15 before q1 q2 ...
    SPARK_GRAFT_NO_SPREAD=1 python tools/dump_plans.py r15 before ...

Plan-only: builders are invoked but nothing is executed.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from rabbit_data_pipeline_spark.queries import registry
    from rabbit_data_pipeline_spark.queries.llm import (
        bpe_train_scale,
        bpe_train_topm_scale,
        dedup_minhash_scale,
        multimodal_codec_scale,
    )
    from rabbit_data_pipeline_spark.session import get_spark

    spark = get_spark("rdps-plans")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    overrides = {
        "dedup_minhash": dedup_minhash_scale,
        "bpe_train_scale": bpe_train_scale,
        "bpe_train_topm_scale": bpe_train_topm_scale,
        "multimodal_codec_scale": multimodal_codec_scale,
    }
    for name in names:
        builder = overrides.get(name) or (reg[name].builder if name in reg else None)
        if builder is None:
            print(f"!! unknown query {name}")
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            builder(spark, sf_dir).explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
