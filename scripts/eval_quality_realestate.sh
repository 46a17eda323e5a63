#!/bin/bash
# Paired-image quality eval (reference scripts/eval_quality_realestate.sh:
# T=0.5, 1 sample over the fixed 3600 triples)
python - <<'PY'
import os
from pixelsynth_tpu.data.realestate10k import RealEstate10KFixed
from pixelsynth_tpu.demo import load_model
from pixelsynth_tpu.eval.harness import eval_quality
ps, variables = load_model("runs/")
ds = RealEstate10KFixed(
    data_path=os.environ.get("REAL_ESTATE_10K", "data/realestate"),
    indices_path="data/realestate_test_indices.npy")
eval_quality(ps, variables, ds, "eval_out/", num_samples=1, temperature=0.5)
PY
python -m pixelsynth_tpu.eval.calc_errors eval_out/
