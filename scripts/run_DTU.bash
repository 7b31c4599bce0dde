#!/bin/bash
set -e
export PYTHONPATH=.

# Train the UDF edge field
python main.py --conf ./confs/DTU.conf --mode train

# Extract parametric edges
python main.py --conf ./confs/DTU.conf --mode extract_edge
