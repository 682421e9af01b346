"""Convert official SuperPoint / LightGlue torch checkpoints to the npz
weight naming consumed by fastlivo_tpu.backend.superpoint_lightglue.

Run wherever the public checkpoints are available (this repo's build
environment has no network access and the reference ships only
.MISSING_LARGE_BLOBS placeholders for its ONNX weights):

    python examples/export_lightglue_weights.py \
        superpoint_v1.pth superglue-style-lightglue.pth out_dir/

Produces out_dir/superpoint.npz and out_dir/lightglue.npz; use as
    SuperPointLightGlue(weights_path=(".../superpoint.npz",
                                      ".../lightglue.npz"))

Mapping notes:
- SuperPoint conv weights are stored torch-style (cout, cin, kh, kw) and
  transposed here to HWIO (kh, kw, cin, cout).
- LightGlue per-layer tensors map as
    transformers.{i}.self_attn.{Wqkv split} -> l{i}.self.{q,k,v}.w/.b
    transformers.{i}.self_attn.out_proj    -> l{i}.self.o
    transformers.{i}.ffn.*                 -> l{i}.self.mlp0/mlp1
  (same under cross_attn), the rotary keypoint encoder to kenc.w, and the
  matchability / final projection heads verbatim. Linear weights are
  transposed (torch stores (out, in); we use (in, out)).
"""

import sys

import numpy as np


def export_superpoint(pth_path: str, out_path: str):
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {}
    for name in (
        "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
        "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb",
    ):
        w = sd[f"{name}.weight"].numpy()
        out[f"{name}.w"] = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        out[f"{name}.b"] = sd[f"{name}.bias"].numpy()
    np.savez(out_path, **out)
    print(f"superpoint: {len(out)} tensors -> {out_path}")


def export_lightglue(pth_path: str, out_path: str, n_layers: int = 9):
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    def lin(t):  # torch (out, in) -> (in, out)
        return np.ascontiguousarray(t.numpy().T)

    out = {"kenc.w": lin(sd["posenc.Wr.weight"]), "n_layers": np.asarray(n_layers)}
    for i in range(n_layers):
        for src, dst in (("self_attn", "self"), ("cross_attn", "cross")):
            base = f"transformers.{i}.{src}"
            qkv_w = sd[f"{base}.Wqkv.weight"].numpy()  # (3d, d)
            qkv_b = sd[f"{base}.Wqkv.bias"].numpy()
            d = qkv_w.shape[1]
            for j, nm in enumerate(("q", "k", "v")):
                out[f"l{i}.{dst}.{nm}.w"] = np.ascontiguousarray(
                    qkv_w[j * d : (j + 1) * d].T
                )
                out[f"l{i}.{dst}.{nm}.b"] = qkv_b[j * d : (j + 1) * d]
            out[f"l{i}.{dst}.o.w"] = lin(sd[f"{base}.out_proj.weight"])
            out[f"l{i}.{dst}.o.b"] = sd[f"{base}.out_proj.bias"].numpy()
            out[f"l{i}.{dst}.mlp0.w"] = lin(sd[f"transformers.{i}.{src}.ffn.0.weight"])
            out[f"l{i}.{dst}.mlp0.b"] = sd[f"transformers.{i}.{src}.ffn.0.bias"].numpy()
            out[f"l{i}.{dst}.mlp1.w"] = lin(sd[f"transformers.{i}.{src}.ffn.3.weight"])
            out[f"l{i}.{dst}.mlp1.b"] = sd[f"transformers.{i}.{src}.ffn.3.bias"].numpy()
    out["matchability.w"] = lin(sd["token_confidence.8.matchability.weight"]) \
        if "token_confidence.8.matchability.weight" in sd else lin(
            sd["log_assignment.8.matchability.weight"]
        )
    out["matchability.b"] = sd.get(
        "log_assignment.8.matchability.bias",
        sd.get("token_confidence.8.matchability.bias"),
    ).numpy()
    out["final_proj.w"] = lin(sd["log_assignment.8.final_proj.weight"])
    out["final_proj.b"] = sd["log_assignment.8.final_proj.bias"].numpy()
    np.savez(out_path, **out)
    print(f"lightglue: {len(out)} tensors -> {out_path}")


if __name__ == "__main__":
    import os

    sp, lg, out_dir = sys.argv[1:4]
    os.makedirs(out_dir, exist_ok=True)
    export_superpoint(sp, os.path.join(out_dir, "superpoint.npz"))
    export_lightglue(lg, os.path.join(out_dir, "lightglue.npz"))
