"""Convert a reference pcdet .pth checkpoint into this framework's orbax
format (checkpoint interop — SURVEY.md §7 hard part 6: load the released
`pillarnet_fullset_lidar.pth` teacher without retraining).

Layout conventions:
- torch Conv2d weight (O, I, kH, kW) -> HWIO (kH, kW, I, O); depthwise convs
  (groups=C) map (C, 1, kH, kW) -> (kH, kW, 1, C).
- torch ConvTranspose2d weight (I, O, kH, kW) -> (kH, kW, I, O).
- torch Linear (O, I) -> Dense kernel (I, O).
- spconv 2.x SubM/SparseConv2d weight (O, kH, kW, I) -> (kH, kW, I, O)
  (spconv 1.x files arrive as (kH, kW, I, O); the reference itself adapts
  between the two, detector3d_template.py:411-440 — we detect by shape).
- BN: weight->scale, bias->bias, running_{mean,var}->batch_stats {mean,var}.
- The 6 SeparateHeads' per-subhead convs are STACKED into our grouped-conv
  kernels: per-head (O, I, 3, 3) -> grouped (3, 3, I, n_heads*O), head h in
  output channels [h*O, (h+1)*O); hm heads are padded to max_cls channels.

Module-path tables mirror the reference classes:
  PillarRes18BackBone8x (spconv_backbone_2d.py:208-259), BaseBEVBackboneV2
  (base_bev_backbone.py:205-282), Radar_Distill (radar_distill_final.py:30-79),
  ConvNeXtBlock (Basicblock_convn.py:10-36), CenterHead (center_head.py:74-95,
  SeparateHead :11-38), DynamicPillarVFESimple2D PFN (dynamic_pillar_vfe.py:14-33).
"""

import argparse
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def t_conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def t_deconv(w):
    return np.transpose(w, (2, 3, 0, 1))


def t_linear(w):
    return np.transpose(w, (1, 0))


def t_spconv(w):
    if w.ndim != 4:
        return w
    if w.shape[1] == w.shape[2] and w.shape[1] in (1, 3, 5, 7) and w.shape[0] != w.shape[1]:
        return np.transpose(w, (1, 2, 3, 0))  # (O,kH,kW,I) -> HWIO
    return w


def set_in(tree, path, value):
    d = tree
    for k in path[:-1]:
        d = d.setdefault(k, {})
    d[path[-1]] = np.asarray(value)


class Converter:
    def __init__(self):
        self.params = {}
        self.stats = {}
        self.unmapped = []
        # staged per-(scope, subhead) head tensors for stacking
        self.head_stash = defaultdict(dict)

    # -- leaf writers --------------------------------------------------------

    def conv(self, path, leaf, val, transpose=t_conv):
        if leaf == "weight":
            set_in(self.params, path + ("kernel",), transpose(val))
        elif leaf == "bias":
            set_in(self.params, path + ("bias",), val)

    def masked_bn(self, path, leaf, val):
        """MaskedBatchNorm: params at module level, stats in batch_stats."""
        if leaf == "weight":
            set_in(self.params, path + ("scale",), val)
        elif leaf == "bias":
            set_in(self.params, path + ("bias",), val)
        elif leaf == "running_mean":
            set_in(self.stats, path + ("mean",), val)
        elif leaf == "running_var":
            set_in(self.stats, path + ("var",), val)

    def flax_bn(self, path, leaf, val):
        """BatchNormTorch: wraps nn.BatchNorm under 'bn'."""
        if leaf in ("weight", "bias"):
            set_in(self.params, path + ("bn", "scale" if leaf == "weight" else "bias"), val)
        elif leaf == "running_mean":
            set_in(self.stats, path + ("bn", "mean"), val)
        elif leaf == "running_var":
            set_in(self.stats, path + ("bn", "var"), val)

    def layer_norm(self, path, leaf, val):
        set_in(self.params, path + ("ln", "scale" if leaf == "weight" else "bias"), val)

    def dense(self, path, leaf, val):
        if leaf == "weight":
            set_in(self.params, path + ("kernel",), t_linear(val))
        else:
            set_in(self.params, path + ("bias",), val)

    # -- per-module mappers --------------------------------------------------

    def map_vfe(self, scope, parts, leaf, val):
        # parts = ['pfn_layers', K, 'linear'|'norm']
        k = parts[1]
        sub = parts[2]
        if sub == "linear":
            self.dense((scope, f"pfn_{k}", "linear"), leaf, val)
        elif sub == "norm":
            self.masked_bn((scope, f"pfn_{k}", "norm"), leaf, val)
        else:
            raise KeyError(sub)

    def map_backbone(self, scope, parts, leaf, val):
        stage, idx = parts[0], int(parts[1])
        if stage in ("conv2", "conv3", "conv4") and idx == 0:
            # post_act_block down: Sequential(conv, norm, relu) -> '0'/'1'
            if parts[2] == "0":
                self.conv((scope, f"{stage}_down", "conv", "conv"), leaf, val, t_spconv)
            else:
                self.masked_bn((scope, f"{stage}_down", "bn"), leaf, val)
            return
        if stage == "conv5":
            if idx == 0:  # dense Sequential(conv, bn, relu)
                if parts[2] == "0":
                    self.conv((scope, "conv5_down_conv", "conv"), leaf, val)
                else:
                    self.flax_bn((scope, "conv5_down_bn"), leaf, val)
                return
            block = f"conv5_{idx - 1}"  # DenseBasicBlock
            mod = parts[2]
            if mod.startswith("conv"):
                self.conv((scope, block, mod, "conv"), leaf, val)
            else:
                self.flax_bn((scope, block, mod), leaf, val)
            return
        # residual SparseBasicBlocks: conv1.{0,1}, convN.{1,2}
        block = f"{stage}_{idx if stage == 'conv1' else idx - 1}"
        mod = parts[2]  # conv1/bn1/conv2/bn2 or downsample (absent here)
        if mod.startswith("conv"):
            self.conv((scope, block, mod, "conv"), leaf, val, t_spconv)
        else:
            self.masked_bn((scope, block, mod), leaf, val)

    def map_neck(self, scope, parts, leaf, val):
        # blocks.B.I... Sequential [ZeroPad, Conv, BN, ReLU] + n*[Conv, BN, ReLU]
        if parts[0] == "blocks":
            b, i = parts[1], int(parts[2])
            block = f"block{b}"
            if i == 1:
                self.conv((scope, block, "conv_in", "conv"), leaf, val)
            elif i == 2:
                self.flax_bn((scope, block, "bn_in"), leaf, val)
            elif (i - 4) % 3 == 0:
                self.conv((scope, block, f"conv_{(i - 4) // 3}", "conv"), leaf, val)
            elif (i - 5) % 3 == 0:
                self.flax_bn((scope, block, f"bn_{(i - 5) // 3}"), leaf, val)
            else:
                raise KeyError(parts)
            return
        if parts[0] == "deblocks":
            # after the [1:] cut only one deblock survives; its Sequential is
            # [ConvTranspose, BN, ReLU]
            i = int(parts[2])
            if i == 0:
                if leaf == "weight":
                    set_in(self.params, (scope, "deblock1_deconv", "kernel"), t_deconv(val))
                else:
                    set_in(self.params, (scope, "deblock1_deconv", "bias"), val)
            elif i == 1:
                self.flax_bn((scope, "deblock1_bn"), leaf, val)
            return
        raise KeyError(parts)

    def map_convnext(self, scope, block, parts, leaf, val):
        mod = parts[0]
        if mod == "dwconv":
            self.conv((scope, block, "dwconv", "conv"), leaf, val)
        elif mod == "norm":
            self.layer_norm((scope, block, "norm"), leaf, val)
        elif mod in ("pwconv1", "pwconv2"):
            self.dense((scope, block, mod), leaf, val)
        elif mod == "grn":
            # reference GRN params are named gamma/beta (Basicblock_convn.py:89-90)
            set_in(self.params, (scope, block, "grn", leaf), val)
        elif mod == "conv_offset_mask1":
            self.conv((scope, block, "conv_offset_mask1", "conv"), leaf, val)
        elif mod == "down_layer":
            if leaf == "weight":
                set_in(self.params, (scope, block, "down_weight"), t_conv(val))
            elif leaf == "bias":
                # frozen-at-init DCN bias (modulated_deform_conv.py:38-49);
                # lives in reference checkpoints despite bias=False
                set_in(self.params, (scope, block, "down_bias"), val)
        else:
            raise KeyError(mod)

    def map_cma(self, parts, leaf, val):
        scope = "radar_cma"
        mod, idx = parts[0], parts[1]
        if mod.startswith("encoder"):
            block = f"{mod}_{idx}"
            self.map_convnext(scope, block, parts[2:], leaf, val)
        elif mod.startswith("decoder"):
            i = int(idx)
            if i == 0:
                if leaf == "weight":
                    set_in(self.params, (scope, mod, "deconv", "kernel"), t_deconv(val))
                else:
                    set_in(self.params, (scope, mod, "deconv", "bias"), val)
            elif i == 1:
                self.flax_bn((scope, mod, "bn"), leaf, val)
        elif mod.startswith("agg"):
            i = int(idx)
            if i == 0:
                self.conv((scope, mod, "conv", "conv"), leaf, val)
            elif i == 1:
                self.flax_bn((scope, mod, "bn"), leaf, val)
        else:
            raise KeyError(mod)

    def map_head(self, scope, parts, leaf, val):
        if parts[0] == "shared_conv":
            i = int(parts[1])
            if i == 0:
                self.conv((scope, "shared_conv", "conv"), leaf, val)
            elif i == 1:
                self.flax_bn((scope, "shared_bn"), leaf, val)
            return
        if parts[0] == "heads_list":
            # heads_list.H.<subhead>.I... — stash for stacking
            h = int(parts[1])
            sub = parts[2]
            rest = ".".join(parts[3:]) + "." + leaf
            self.head_stash[(scope, sub)].setdefault(h, {})[rest] = val
            return
        raise KeyError(parts)

    def finalize_heads(self, max_cls=2):
        """Stack stashed per-head subhead tensors into grouped-conv params.

        SeparateHead structure per subhead (center_head.py:20-28):
          <sub>.0.0 Conv, <sub>.0.1 BN, <sub>.1 final Conv.
        Our StackedSubHead: conv_0 (grouped, Conv2dTorch), bn_0
        (BatchNormTorch), conv_out (grouped nn.Conv).
        """
        for (scope, sub), heads in self.head_stash.items():
            n = len(heads)
            def stack(key, pad_to=None, is_bn=False):
                vals = [heads[h][key] for h in range(n)]
                if pad_to is not None:  # hm channel padding
                    vals = [
                        np.concatenate(
                            [v] + [np.zeros_like(v[:1])] * (pad_to - v.shape[0]), 0
                        ) if v.shape[0] < pad_to else v
                        for v in vals
                    ]
                return vals

            # hidden conv + bn
            w = stack("0.0.weight")
            kern = np.concatenate([t_conv(v) for v in w], axis=-1)  # (3,3,C,n*C)
            set_in(self.params, (scope, sub, "conv_0", "conv", "kernel"), kern)
            if "0.0.bias" in heads[0]:
                set_in(self.params, (scope, sub, "conv_0", "conv", "bias"),
                       np.concatenate(stack("0.0.bias")))
            set_in(self.params, (scope, sub, "bn_0", "bn", "scale"),
                   np.concatenate(stack("0.1.weight")))
            set_in(self.params, (scope, sub, "bn_0", "bn", "bias"),
                   np.concatenate(stack("0.1.bias")))
            set_in(self.stats, (scope, sub, "bn_0", "bn", "mean"),
                   np.concatenate(stack("0.1.running_mean")))
            set_in(self.stats, (scope, sub, "bn_0", "bn", "var"),
                   np.concatenate(stack("0.1.running_var")))
            # final conv (pad hm channels to max_cls)
            pad = max_cls if sub == "hm" else None
            wf = stack("1.weight", pad_to=pad)
            set_in(self.params, (scope, sub, "conv_out", "kernel"),
                   np.concatenate([t_conv(v) for v in wf], axis=-1))
            bf = stack("1.bias", pad_to=pad)
            set_in(self.params, (scope, sub, "conv_out", "bias"), np.concatenate(bf))

    # -- driver ---------------------------------------------------------------

    def convert(self, sd, max_cls=2):
        for key, val in sd.items():
            if key.endswith("num_batches_tracked"):
                continue
            val = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
            parts = key.split(".")
            top, leaf = parts[0], parts[-1]
            body = parts[1:-1]
            try:
                if top in ("vfe", "radar_vfe"):
                    self.map_vfe(top, body, leaf, val)
                elif top in ("backbone_3d", "radar_backbone_3d"):
                    self.map_backbone(top, body, leaf, val)
                elif top == "backbone_2d":
                    self.map_neck("backbone_2d", body, leaf, val)
                elif top == "radar_backbone_2d":
                    # Radar_Distill: CMA members vs inherited neck members
                    if body[0] in ("blocks", "deblocks"):
                        self.map_neck("radar_neck", body, leaf, val)
                    else:
                        self.map_cma(body, leaf, val)
                elif top in ("dense_head", "radar_dense_head"):
                    self.map_head(top, body, leaf, val)
                else:
                    self.unmapped.append(key)
            except (KeyError, IndexError, ValueError) as e:
                self.unmapped.append(key)
        self.finalize_heads(max_cls=max_cls)
        return self.params, self.stats, self.unmapped


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True)
    parser.add_argument("--dst", required=True)
    parser.add_argument("--report_only", action="store_true")
    args = parser.parse_args()

    import torch

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state", ckpt)
    params, stats, unmapped = Converter().convert(sd)
    print(f"mapped {len(sd) - len(unmapped)}/{len(sd)} tensors")
    for k in unmapped[:20]:
        print("  unmapped:", k)
    if args.report_only:
        return

    import orbax.checkpoint as ocp

    payload = {
        "state": {"params": params, "batch_stats": stats, "step": np.asarray(0),
                  "opt_state": {}},
        "epoch": np.asarray(int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0),
        "it": np.asarray(0),
        "version": "converted",
    }
    ocp.PyTreeCheckpointer().save(Path(args.dst).absolute(), payload)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
