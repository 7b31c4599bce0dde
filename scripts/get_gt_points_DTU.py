#!/usr/bin/env python
"""DTU ground-truth edge-point builder (reference scripts/get_gt_points_DTU.py).

Projects the DTU STL scan points into every PidiNet edge map, keeps points
that are edge-visible (projected edge value > per-scan threshold) in more than
ratio*num_frames frames, voxel-average-downsamples at 256^3, and writes
edge_points.ply in GT coordinates.

Per-scan (threshold, ratio) table matches the reference (:229-236). Edge maps
are loaded inverted (1 - v/255, reference :88).

Usage: python scripts/get_gt_points_DTU.py \
    --gt_point_cloud_dir data/DTU_Edge/groundtruth \
    --dataset_dir data/DTU_Edge/data \
    --out_dir data/DTU_Edge/groundtruth/edge_points
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2  # noqa: E402

from emap_tpu.eval.metrics import downsample_point_cloud_average  # noqa: E402
from emap_tpu.utils.ply import read_ply_points, write_ply_points  # noqa: E402

SCAN_THRESHOLDS = {
    "scan37": (0.55, 0.3),
    "scan83": (0.65, 0.2),
    "scan105": (0.65, 0.2),
    "scan110": (0.5, 0.3),
    "scan118": (0.5, 0.3),
    "scan122": (0.35, 0.4),
}


def load_edge_maps(data_dir: str):
    with open(os.path.join(data_dir, "meta_data.json")) as f:
        meta = json.load(f)
    h, w = int(meta["height"]), int(meta["width"])
    edges, intrinsics, camtoworld = [], [], []
    for frame in meta["frames"]:
        path = os.path.join(data_dir, "edge_PidiNet", frame["rgb_path"])
        edges.append(1.0 - cv2.imread(path, 0).astype(np.float64) / 255.0)
        intrinsics.append(np.asarray(frame["intrinsics"], np.float64))
        camtoworld.append(np.asarray(frame["camtoworld"], np.float64)[:4, :4])
    return np.stack(edges), np.stack(intrinsics), np.stack(camtoworld), h, w


def point_visibility(points, edges, intrinsics, camtoworld, h, w,
                     threshold, min_frames):
    count = np.zeros(len(points))
    for edge_map, K, c2w in zip(edges, intrinsics, camtoworld):
        w2c = np.linalg.inv(c2w)
        cam = points @ w2c[:3, :3].T + w2c[:3, 3]
        uvz = cam @ K[:3, :3].T
        uv = np.round(uvz[:, :2] / uvz[:, 2:3]).astype(np.int64)
        valid = (uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0) & (uv[:, 1] < h)
        vis = np.zeros(len(points))
        vis[valid] = (
            edge_map[uv[valid, 1], uv[valid, 0]] > threshold
        ).astype(float)
        count += vis
    return count > min_frames


def main(gt_point_cloud_dir, dataset_dir, out_dir):
    np.random.seed(42)
    stl_dir = os.path.join(gt_point_cloud_dir, "Points", "stl")
    if not os.path.exists(stl_dir):
        print(
            f"Ground truth point cloud directory {stl_dir} does not exist. "
            "Download it from "
            "http://roboimagedata2.compute.dtu.dk/data/MVS/Points.zip"
        )
        return

    os.makedirs(out_dir, exist_ok=True)
    for scan_name, (threshold, ratio) in SCAN_THRESHOLDS.items():
        output_file = os.path.join(out_dir, scan_name, "edge_points.ply")
        if os.path.exists(output_file):
            print(f"{output_file} already exists. Skipping.")
            continue
        meta_dir = os.path.join(dataset_dir, scan_name)
        if not os.path.exists(os.path.join(meta_dir, "meta_data.json")):
            print(f"missing meta for {scan_name}; skipping")
            continue
        os.makedirs(os.path.join(out_dir, scan_name), exist_ok=True)

        with open(os.path.join(meta_dir, "meta_data.json")) as f:
            worldtogt = np.asarray(json.load(f)["worldtogt"])
        gttoworld = np.linalg.inv(worldtogt)

        stl_path = os.path.join(
            stl_dir, f"stl{int(scan_name[4:]):03d}_total.ply"
        )
        gt_points, _ = read_ply_points(stl_path)
        points = gt_points @ gttoworld[:3, :3].T + gttoworld[:3, 3]

        edges, intrinsics, camtoworld, h, w = load_edge_maps(meta_dir)
        min_frames = max(1, round(ratio * len(edges)))
        vis = point_visibility(
            points, edges, intrinsics, camtoworld, h, w, threshold, min_frames
        )
        print(
            f"{scan_name}: before visibility check: {len(points)}, "
            f"after: {int(vis.sum())}"
        )
        edge_points = downsample_point_cloud_average(
            points[vis], num_voxels_per_axis=256
        )
        edge_points = edge_points @ worldtogt[:3, :3].T + worldtogt[:3, 3]
        write_ply_points(output_file, edge_points)
        print(f"Saved downsampled edge point cloud to {output_file}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--gt_point_cloud_dir", type=str, default="data/DTU_Edge/groundtruth"
    )
    parser.add_argument("--dataset_dir", type=str, default="data/DTU_Edge/data")
    parser.add_argument(
        "--out_dir", type=str, default="data/DTU_Edge/groundtruth/edge_points"
    )
    args = parser.parse_args()
    main(args.gt_point_cloud_dir, args.dataset_dir, args.out_dir)
