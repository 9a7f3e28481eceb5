"""Configuration system.

CLI parity with the reference mode-switched argparse factory
(reference utils/args.py:3-89): same seven entry modes, same flag names and
defaults. Internally everything is carried in frozen dataclasses so configs are
hashable and can be closed over by jitted functions.
"""

from __future__ import annotations

import argparse
import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class CamConfig:
    """Two-aperture thin-lens camera parameters (reference utils/args.py:14)."""

    s: float = 0.1104
    rho_1: float = 10.0
    rho_2: float = 10.2
    sigma_cam: float = 0.003
    pixel_pitch: float = 5.86e-6

    @property
    def rhos(self) -> Tuple[float, float]:
        return (self.rho_1, self.rho_2)


@dataclasses.dataclass(frozen=True)
class PatchConfig:
    """Patch geometry shared by every stage (reference utils/args.py:11-13, 42)."""

    R: int = 21  # patch size
    w: float = 1.0  # wedge back-side SDF weight
    alpha_lambda: float = 5e-3  # ridge lambda rate; lambda = (alpha_lambda * R^2)^2
    stride: int = 2
    mag: float = 4.0

    @property
    def lambda_ridge(self) -> float:
        return (self.alpha_lambda * self.R**2) ** 2


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Patch-grid geometry for a given image size (reference
    utils/postprocessing_loss.py:135-137)."""

    H: int = 147
    W: int = 147
    R: int = 21
    stride: int = 2

    @property
    def H_patches(self) -> int:
        return int(math.floor((self.H - self.R) / self.stride) + 1)

    @property
    def W_patches(self) -> int:
        return int(math.floor((self.W - self.R) / self.stride) + 1)

    @property
    def num_tokens(self) -> int:
        return self.H_patches * self.W_patches


DEFAULT_CAM = CamConfig()
DEFAULT_PATCH = PatchConfig()
DEFAULT_GRID = GridConfig()


def get_args(mode: str, big: bool = False, argv: Optional[list] = None) -> argparse.Namespace:
    """Mode-switched argparse factory, flag-for-flag with reference
    utils/args.py:3-89.

    The ``--cuda`` flag is accepted for CLI parity but ignored (JAX picks the
    TPU/CPU backend). Pass ``argv=[]`` for programmatic use with defaults.
    """
    parser = argparse.ArgumentParser()

    # basic settings (reference utils/args.py:6-15)
    parser.add_argument('--cuda', type=str, default='cuda:0', help='accepted for parity; ignored (JAX backend)')
    parser.add_argument('--model_path', type=str, default='./pretrained_weights', help='path of model weights')
    parser.add_argument('--img_size', type=int, nargs=2, default=[147, 147], help='image size')
    parser.add_argument('--big_img_size', type=int, nargs=2, default=[587, 587], help='big image size')
    parser.add_argument('--R', type=int, default=21, help='patch size')
    parser.add_argument('--w', type=float, default=1, help='w in loss function')
    parser.add_argument('--alpha_lambda', type=float, default=5e-3, help='rate for lambda in ridge regression')
    parser.add_argument('--cam_params', type=dict,
                        default={'s': 0.1104, 'rho_1': 10.0, 'rho_2': 10.2,
                                 'sigma_cam': 0.003, 'pixel_pitch': 5.86e-6},
                        help='camera parameters')
    parser.add_argument('--mag', type=float, default=4, help='magnification factor')

    if mode == 'data_gen_train_val':  # reference utils/args.py:18-25
        parser.add_argument('--data_path', type=str, default='./data/data_train_val', help='path of dataset')
        parser.add_argument('--num_sample_train', type=int, default=8000, help='number of samples to generate in training set')
        parser.add_argument('--num_sample_val', type=int, default=2000, help='number of samples to generate in validation set')
        parser.add_argument('--num_shape', type=int, nargs=2, default=[15, 26], help='number of shapes to generate in each image')
        parser.add_argument('--Z_range', type=float, nargs=2, default=[0.75, 1.18], help='distance between the object and the camera (m)')
        parser.add_argument('--alpha', type=float, nargs=2, default=[180.0, 200.0], help='maximum average number of photons')
        parser.add_argument('--sigma', type=float, default=2, help='read noise coefficient')

    elif mode == 'local_train':  # reference utils/args.py:28-36
        parser.add_argument('--data_path', type=str, default='./data/data_train_val/patches', help='path of dataset')
        parser.add_argument('--log_path', type=str, default='./logs', help='path of logs')
        parser.add_argument('--epoch_num', type=int, default=1000, help='number of epochs')
        parser.add_argument('--learning_rate', type=float, default=6e-5, help='initial learning rate for late training')
        parser.add_argument('--batch_size', type=int, default=64, help='batch size')
        parser.add_argument('--beta_bndry_loc', type=float, default=0.001, help='weight for boundary localization error')
        parser.add_argument('--beta_smthns', type=float, default=0.0005, help='weight for smoothness error')
        parser.add_argument('--dynamic_epoch', type=int, default=200, help='key epoch of dynamic scheduling')
        parser.add_argument('--dp_devices', type=int, default=0, help='data-parallel devices (0/1 = single device); shards the batch over a jax mesh')

    elif mode == 'global_pre':  # reference utils/args.py:39-42
        parser.add_argument('--stride', type=int, default=2, help='stride')
        parser.add_argument('--data_path', type=str, default='./data/data_train_val', help='path of dataset')
        parser.add_argument('--batch_size', type=int, default=1, help='batch size')

    elif mode == 'global_train':  # reference utils/args.py:45-64
        parser.add_argument('--stride', type=int, default=2, help='stride')
        parser.add_argument('--data_path', type=str, default='./data/data_train_val', help='path of dataset')
        parser.add_argument('--log_path', type=str, default='./logs', help='path of logs')
        parser.add_argument('--epoch_num', type=int, default=350, help='number of epochs')
        parser.add_argument('--learning_rate', type=float, default=1e-4, help='initial learning rate for late training')
        parser.add_argument('--batch_size', type=int, default=8, help='number of batch size')
        parser.add_argument('--gamma_color', type=float, nargs=3, default=[1.0, 0.1, 0.1], help='weight for color error')
        parser.add_argument('--gamma_color_cons', type=float, nargs=3, default=[0.2, 0.1, 0.05], help='weight for color consistency error')
        parser.add_argument('--gamma_bndry_cons', type=float, nargs=3, default=[0.05, 0.05, 0.02], help='weight for boundary consistency error')
        parser.add_argument('--gamma_smthns', type=float, nargs=3, default=[0.005, 0.1, 0.002], help='weight for smothness error')
        parser.add_argument('--gamma_smthns_cons', type=float, nargs=3, default=[0.005, 0.1, 0.002], help='weight for smothness consistency error')
        parser.add_argument('--gamma_bndry_loc', type=float, nargs=3, default=[0.0001, 0.05, 0.0001], help='weight for boundary localization error')
        parser.add_argument('--gamma_depth', type=float, nargs=3, default=[0.0001, 0.05, 0.5], help='weight for depth error')
        parser.add_argument('--dynamic_epoch', type=int, nargs=3, default=[30, 100, 200], help='key epoch of dynamic scheduling')
        parser.add_argument('--input_size', type=int, default=38, help='input layer size')
        parser.add_argument('--output_size', type=int, default=12, help='output layer size')
        parser.add_argument('--dp_devices', type=int, default=0, help='data-parallel devices (0/1 = single device); shards the batch over a jax mesh')
        # TPU-harness additions (no reference counterpart): time-boxed /
        # crash-resilient runs on a single chip
        parser.add_argument('--train_subset', type=int, default=0, help='cap the train split to the first N samples (0 = all)')
        parser.add_argument('--val_batches', type=int, default=0, help='cap the per-epoch val sweep to N batches (0 = full sweep)')
        parser.add_argument('--skip_val', action='store_true', help='skip the val sweep; best-checkpoint selection falls back to the mean TRAIN loss (deviation from reference best-val semantics, logged loudly)')
        parser.add_argument('--snapshot_steps', type=int, default=50, help='full train-state snapshot every N optimizer steps (0 = epoch boundaries only)')
        parser.add_argument('--attn_impl', type=str, default='xla', choices=['xla', 'flash'], help="global-stage attention: 'xla' (f32, torch-parity numerics; used for all committed checkpoints) or 'flash' (Pallas kernel, EXPERIMENTAL: no attention-prob dropout, f32 operands, and measured SLOWER than 'xla' at this model's head_dim=16 on v5e - see METRICS.md)")
        parser.add_argument('--time_budget_s', type=int, default=0, help='exit cleanly (snapshot + resume marker) after N seconds of training (0 = no budget)')
        parser.add_argument('--init_from', type=str, default=None, help='warm-start model params from this orbax checkpoint directory (optimizer/scheduler state starts fresh); e.g. fine-tune --w_variant from the trained shared global stage')
        parser.add_argument('--w_variant', action='store_true', help="train the 'w'-variant global stage: depth term supervised on hard wedge-side masks (the masks --densify w consumes at inference, reference blurry_edges_test.py:47-49); checkpoints/logs saved under *_w names (the reference distributes pretrained_global_stage_w.pth but ships no script to train it)")

    if mode == 'data_gen_test':  # reference utils/args.py:67-74
        parser.add_argument('--data_path', type=str, default='./data/data_test', help='path of dataset')
        parser.add_argument('--frgd_path', type=str, default='./data/MS_COCO_annotations/', help='path of MS COCO dataset')
        parser.add_argument('--bkgd_path', type=str, default='./data/Painting/', help='path of painting dataset')
        parser.add_argument('--num_sample_test', type=int, default=200, help='number of samples to generate in testing set')
        parser.add_argument('--Z_range', type=float, nargs=2, default=[0.75, 1.18], help='distance between the object and the camera (m)')
        parser.add_argument('--alpha', type=int, nargs=2, default=[180, 200], help='maximum average number of photons')
        parser.add_argument('--sigma', type=float, default=2, help='read noise coefficient')

    elif mode == 'eval':  # reference utils/args.py:77-87
        parser.add_argument('--stride', type=int, default=2, help='stride')
        parser.add_argument('--log_path', type=str, default='./logs', help='path of logs')
        parser.add_argument('--batch_size', type=int, default=1, help='batch size')
        parser.add_argument('--crop', type=int, default=10, help='center crop')
        parser.add_argument('--rho_prime', type=float, default=10.39, help='equivalent optical power for refocusing')
        parser.add_argument('--densify', type=str, default=None, help='densification method, set None to disable', choices=[None, 'pp', 'w'])
        parser.add_argument('--serve_dtype', type=str, default='float32', choices=['float32', 'bfloat16'], help='model compute dtype for serving (params stay float32). bfloat16 runs the CNN/transformer forwards on the MXU in bf16; the analytic wedge/DfD/fold chain and the confidence threshold always stay float32 (bf16 there cost threshold coverage, METRICS.md bf16 note)')
        parser.add_argument('--vis_max', type=int, default=0, help='write the 10-panel visualization for only the first N pairs (0 = all, reference behavior)')
        parser.add_argument('--dp_devices', type=int, default=0, help='data-parallel devices (0/1 = single device); big path: shards the block grid over the mesh; 147x147 path: evaluates images in sharded groups of this size (s/pair = group time / devices)')
        if big:
            parser.add_argument('--n_margin_patch', type=int, default=10, help='number of margin patches that will be removed for global maps')
            parser.add_argument('--block_chunk', type=int, default=6, help='blocks batched per lax.map step on the big path (1 = sequential; higher trades HBM for cross-block MXU batching; round-4 sweep on v5e: 1->2.69 s/pair, 4->2.22, 6->2.09 best, 12 OOMs 16 GB HBM - see METRICS.md)')
            parser.add_argument('--data_path', type=str, default='./data/data_test_big', help='path of dataset')
        else:
            parser.add_argument('--data_path', type=str, default='./data/data_test', help='path of dataset')

    return parser.parse_args(argv)


def cam_from_args(args: argparse.Namespace) -> CamConfig:
    cp = args.cam_params
    return CamConfig(s=cp['s'], rho_1=cp['rho_1'], rho_2=cp['rho_2'],
                     sigma_cam=cp['sigma_cam'], pixel_pitch=cp['pixel_pitch'])


def patch_from_args(args: argparse.Namespace) -> PatchConfig:
    return PatchConfig(R=args.R, w=args.w, alpha_lambda=args.alpha_lambda,
                       stride=getattr(args, 'stride', 2), mag=args.mag)


def grid_from_args(args: argparse.Namespace, big: bool = False) -> GridConfig:
    size = args.big_img_size if big else args.img_size
    return GridConfig(H=size[0], W=size[1], R=args.R, stride=getattr(args, 'stride', 2))
