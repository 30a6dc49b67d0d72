"""Offline preprocessing: WOMD tf_example shards -> training TFRecords.

Parity target: reference data_preprocessing.py (``Processor``): per scenario
it emits the exact schema consumed by the training pipeline
(strajnet_tpu.data.schema):

- 512^2 OGM history stack [512, 512, 11, 2] (vehicles | ped+cyc),
- 256^2 matplotlib map raster,
- nearest-48 observed + <=16 approaching-occluded actor tracks,
- <=256 centerline segments,
- historical backward-flow raster (vehicles / ped+cyc),
- 8 GT waypoint grids (observed/occluded occupancy, flow, flow origin).

CLI fan-out uses a multiprocessing Pool over shards like the reference
(data_preprocessing.py:475-504); the rasterizer itself is the jitted JAX
engine in strajnet_tpu.data.raster.

Usage:
    python -m strajnet_tpu.data.preprocess --file_dir .../tf_example \
        --save_dir .../preprocessed_data --ids_dir .../challenge_ids \
        --splits training validation --pool 2
"""

from __future__ import annotations

import argparse
import functools
import glob
import os
from typing import Dict, Optional, Set

import numpy as np

from strajnet_tpu.config import (
    TaskConfig,
    WAYMO_OGM_TASK_CONFIG,
    WAYMO_TASK_CONFIG,
)
from strajnet_tpu.data import raster
from strajnet_tpu.data.map_raster import render_map_image
from strajnet_tpu.data.schema import encode_example
from strajnet_tpu.data.vectorize import (
    rotate_all_from_inputs,
    segment_centerlines,
    select_actors,
)
from strajnet_tpu.data.womd import TYPE_CYCLIST, TYPE_PEDESTRIAN, \
    TYPE_VEHICLE, parse_womd_example


class Processor:
    """Per-shard preprocessing pipeline (reference Processor parity)."""

    def __init__(self, max_actors: int = 48, max_occu: int = 16,
                 rasterisation_size: int = 256, save_dir: str = ".",
                 ids_dir: str = "",
                 config: TaskConfig = WAYMO_TASK_CONFIG,
                 ogm_config: TaskConfig = WAYMO_OGM_TASK_CONFIG):
        self.img_size = rasterisation_size
        self.max_actors = max_actors
        self.max_occu = max_occu
        self.save_dir = save_dir
        self.ids_dir = ids_dir
        self.config = config
        self.ogm_config = ogm_config
        self._jit_cache = {}

    # -- jitted rasterizer entry points (cached per config) --

    def _grids(self, np_inputs, config: TaskConfig, with_future: bool):
        import jax

        key = (config.grid_height_cells, with_future)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(functools.partial(
                raster.create_timestep_grids, config=config,
                with_future=with_future))
        return self._jit_cache[key](np_inputs)

    def get_ids(self, val: bool = True) -> Set[str]:
        name = ("validation_scenario_ids.txt" if val
                else "testing_scenario_ids.txt")
        with open(os.path.join(self.ids_dir, name)) as f:
            return {line.strip() for line in f if line.strip()}

    def process_scenario(self, parsed: Dict[str, np.ndarray],
                         with_future: bool = True) -> Dict[str, np.ndarray]:
        """One scenario -> the full output feature dict (numpy)."""
        # raster inputs (only the state/roadgraph fields the renderer needs)
        rinputs = {k: np.asarray(v) for k, v in parsed.items()
                   if k.startswith(("state/", "roadgraph_samples/"))}

        # --- 512^2 OGM history + historical flow ---
        ogm_grids = self._grids(rinputs, self.ogm_config, with_future=False)
        veh_hist = np.concatenate(
            [np.asarray(ogm_grids.past_occupancy[TYPE_VEHICLE]),
             np.asarray(ogm_grids.current_occupancy[TYPE_VEHICLE])], axis=0)
        ped_hist = np.concatenate(
            [np.clip(np.asarray(ogm_grids.past_occupancy[TYPE_PEDESTRIAN]) +
                     np.asarray(ogm_grids.past_occupancy[TYPE_CYCLIST]),
                     0, 1),
             np.clip(np.asarray(
                 ogm_grids.current_occupancy[TYPE_PEDESTRIAN]) +
                 np.asarray(ogm_grids.current_occupancy[TYPE_CYCLIST]),
                 0, 1)], axis=0)
        # [T, H, W] -> [H, W, T, 2]
        ogm = np.stack([veh_hist.transpose(1, 2, 0),
                        ped_hist.transpose(1, 2, 0)], axis=-1).astype(bool)

        vec_flow = np.asarray(
            ogm_grids.history_flow[TYPE_VEHICLE])[0]  # [H, W, 2]
        byc_flow = (np.asarray(ogm_grids.history_flow[TYPE_PEDESTRIAN])[0] +
                    np.asarray(ogm_grids.history_flow[TYPE_CYCLIST])[0])

        # --- vector features (256^2 model config frame) ---
        rot = rotate_all_from_inputs(rinputs, self.config)
        actors, occl_actors = select_actors(
            rot, np.asarray(parsed["state/type"]), self.max_actors,
            self.max_occu)
        centerlines = segment_centerlines(
            rot, np.asarray(parsed["roadgraph_samples/type"]),
            np.asarray(parsed["roadgraph_samples/id"]))

        # --- map raster ---
        lights_valid = np.where(
            np.asarray(parsed["traffic_light_state/current/valid"])[0] > 0)[0]
        lights = {
            "x": np.asarray(
                parsed["traffic_light_state/current/x"])[0, lights_valid],
            "y": np.asarray(
                parsed["traffic_light_state/current/y"])[0, lights_valid],
            "state": np.asarray(
                parsed["traffic_light_state/current/state"])[0, lights_valid],
        }
        map_image = render_map_image(
            rot["xy_val"], np.asarray(parsed["roadgraph_samples/type"]),
            np.asarray(parsed["roadgraph_samples/id"]), rot["map_mask"],
            traffic_lights=lights, img_size=self.img_size)

        out = {
            "centerlines": centerlines.astype(np.float64),
            "actors": actors.astype(np.float64),
            "occl_actors": occl_actors.astype(np.float64),
            "ogm": ogm,
            "map_image": map_image.astype(np.int8),
            "vec_flow": vec_flow.astype(np.float32),
            "byc_flow": byc_flow.astype(np.float32),
        }

        # --- GT waypoints (rendered at the 512^2 frame like the reference,
        # cropped to 256^2 by the online parser — train.py:93-99) ---
        if with_future:
            gt_grids = self._grids(rinputs, self.ogm_config,
                                   with_future=True)
            wp = raster.create_waypoint_grids(gt_grids, self.config,
                                             obj_type=TYPE_VEHICLE)
            out["gt_obs_ogm"] = np.asarray(
                wp.observed_occupancy).astype(bool)
            out["gt_occ_ogm"] = np.asarray(
                wp.occluded_occupancy).astype(bool)
            out["gt_flow"] = np.asarray(wp.flow).astype(np.float32)
            out["origin_flow"] = np.asarray(
                wp.flow_origin_occupancy).astype(np.float32)
        return out

    def workflow(self, filename: str, pred: bool = False, val: bool = False):
        """Processes one WOMD shard -> one output TFRecord
        (reference data_preprocessing.py:383-448)."""
        import tensorflow as tf
        tf.config.set_visible_devices([], "GPU")

        ids: Optional[Set[str]] = None
        split = "train"
        if pred:
            ids = self.get_ids(val=False)
            split = "test"
        elif val:
            ids = self.get_ids(val=True)
            split = "val"
        os.makedirs(os.path.join(self.save_dir, split), exist_ok=True)
        num = os.path.basename(filename).split("-")[1]
        out_path = os.path.join(self.save_dir, split,
                                f"{num}new.tfrecords")

        dataset = tf.data.TFRecordDataset(filename, compression_type="")
        count = 0
        with tf.io.TFRecordWriter(out_path) as writer:
            for record in dataset:
                parsed = parse_womd_example(record)
                sc_id = parsed["scenario/id"].numpy()[0]
                if isinstance(sc_id, bytes):
                    sc_id = sc_id.decode("utf-8")
                if ids is not None and sc_id not in ids:
                    continue
                np_parsed = {k: v.numpy() for k, v in parsed.items()
                             if k != "scenario/id"}
                feats = self.process_scenario(np_parsed,
                                              with_future=not pred)
                writer.write(encode_example(
                    feats,
                    scenario_id=sc_id if (pred or val) else None,
                    test=pred))
                count += 1
        print(f"{filename}: collect {count}")
        return count


def _process_one(filename: str, save_dir: str, ids_dir: str, split: str):
    print("Working on", filename)
    processor = Processor(save_dir=save_dir, ids_dir=ids_dir)
    processor.workflow(filename, pred=(split == "testing"),
                       val=(split == "validation"))
    print(filename, "done!")


def main():
    from multiprocessing import Pool

    p = argparse.ArgumentParser(description="Data preprocessing")
    p.add_argument("--ids_dir", type=str,
                   default="./Waymo_Dataset/occupancy_flow_challenge/")
    p.add_argument("--save_dir", type=str,
                   default="./Waymo_Dataset/preprocessed_data/")
    p.add_argument("--file_dir", type=str,
                   default="./Waymo_Dataset/tf_example")
    p.add_argument("--pool", type=int, default=2)
    p.add_argument("--splits", nargs="+",
                   default=["training", "validation", "testing"])
    args = p.parse_args()

    for split in args.splits:
        files = sorted(glob.glob(f"{args.file_dir}/{split}/*"))
        print(f"Processing {split} data... {len(files)} found!")
        with Pool(args.pool) as pool:
            pool.starmap(_process_one,
                         [(f, args.save_dir, args.ids_dir, split)
                          for f in files])


if __name__ == "__main__":
    main()
