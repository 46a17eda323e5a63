#!/bin/bash
# The relay: the reference's canonical chained pipeline
# (docs/REALESTATE.md:56-70) trained end to end on procedural panorama
# worlds, stitched into one demo-loadable checkpoint + metric report.
# Stages are resumable (see tools/run_relay.py); --smoke runs in minutes
# on CPU, --profile fast halves the step counts (~45 min on one v5e).
python -m pixelsynth_tpu.tools.run_relay \
    --workdir "${1:-runs/relay}" --evidence "${2:-evidence/relay}" "${@:3}"
