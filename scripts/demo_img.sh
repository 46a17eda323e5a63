#!/bin/bash
# Single novel view (reference scripts/demo_img.sh)
python -m pixelsynth_tpu.demo --img "${1:-demo.png}" --mode gen_img \
    --ckpt-dir runs/ --result-folder demo_out/ --direction R --rotation 0.3
