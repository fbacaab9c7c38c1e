"""Textured Mesh container with OBJ/PLY/GLB export.

Reference: utils/mesh.py (kiui-derived torch Mesh class: load/write
obj/ply/glb, :10-845) — used by the commented-out glb export at
demo.py:467-472.  Here: a small numpy dataclass + a self-contained
binary-glTF writer (no external gltf libs in this environment).
"""
from __future__ import annotations

import io
import json
import os
import struct
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from . import io as pio


@dataclass
class Mesh:
    vertices: np.ndarray                    # [V,3] float32
    faces: np.ndarray                       # [F,3] int
    uvs: Optional[np.ndarray] = None        # [Nuv,2]
    face_uv_idx: Optional[np.ndarray] = None
    texture: Optional[np.ndarray] = None    # [H,W,3] float in [0,1]

    @classmethod
    def load(cls, path: str) -> "Mesh":
        m = pio.load_obj(path)
        tex = None
        png = path.replace(".obj", ".png")
        if os.path.exists(png):
            tex = pio.load_rgb(png)
        return cls(vertices=m["vertices"], faces=m["faces"],
                   uvs=m.get("uvs"), face_uv_idx=m.get("face_uv_idx"),
                   texture=tex)

    # ------------------------------------------------------------------
    def write(self, path: str) -> None:
        if path.endswith(".obj"):
            pio.save_textured_obj(self.vertices, self.uvs, self.faces,
                                  self.face_uv_idx, path)
            if self.texture is not None:
                pio.save_rgb(self.texture, path.replace(".obj", ".png"))
        elif path.endswith(".glb"):
            self.write_glb(path)
        elif path.endswith(".ply"):
            pio.save_colored_pc_ply(
                self.vertices, np.full_like(self.vertices, 0.7), path)
        else:
            raise ValueError(f"unknown mesh format: {path}")

    # ------------------------------------------------------------------
    def _unweld_for_gltf(self):
        """glTF has one index buffer: duplicate vertices per (pos, uv)."""
        if self.uvs is None:
            return (self.vertices.astype(np.float32),
                    None, self.faces.astype(np.uint32))
        key = self.faces.astype(np.int64) * (len(self.uvs) + 1) \
            + self.face_uv_idx.astype(np.int64)
        uniq, inv = np.unique(key.reshape(-1), return_inverse=True)
        v_id = (uniq // (len(self.uvs) + 1)).astype(np.int64)
        uv_id = (uniq % (len(self.uvs) + 1)).astype(np.int64)
        pos = self.vertices[v_id].astype(np.float32)
        # glTF uv origin is top-left; our uvs use v-up (OBJ convention)
        uv = self.uvs[uv_id].astype(np.float32).copy()
        uv[:, 1] = 1.0 - uv[:, 1]
        idx = inv.reshape(-1, 3).astype(np.uint32)
        return pos, uv, idx

    def write_glb(self, path: str) -> None:
        from PIL import Image

        pos, uv, idx = self._unweld_for_gltf()
        buffers = []

        def add(buf_bytes):
            offset = sum(len(b) for b in buffers)
            pad = (-len(buf_bytes)) % 4
            buffers.append(buf_bytes + b"\x00" * pad)
            return offset, len(buf_bytes)

        idx_off, idx_len = add(idx.tobytes())
        pos_off, pos_len = add(pos.tobytes())
        views = [
            {"buffer": 0, "byteOffset": idx_off, "byteLength": idx_len,
             "target": 34963},
            {"buffer": 0, "byteOffset": pos_off, "byteLength": pos_len,
             "target": 34962},
        ]
        accessors = [
            {"bufferView": 0, "componentType": 5125, "count": idx.size,
             "type": "SCALAR"},
            {"bufferView": 1, "componentType": 5126, "count": len(pos),
             "type": "VEC3",
             "min": pos.min(0).tolist(), "max": pos.max(0).tolist()},
        ]
        attributes = {"POSITION": 1}
        material = {"pbrMetallicRoughness": {
            "metallicFactor": 0.0, "roughnessFactor": 1.0}}
        images, textures, samplers = [], [], []

        if uv is not None:
            uv_off, uv_len = add(uv.tobytes())
            views.append({"buffer": 0, "byteOffset": uv_off,
                          "byteLength": uv_len, "target": 34962})
            accessors.append({"bufferView": len(views) - 1,
                              "componentType": 5126, "count": len(uv),
                              "type": "VEC2"})
            attributes["TEXCOORD_0"] = len(accessors) - 1
        if self.texture is not None and uv is not None:
            png = io.BytesIO()
            arr = (np.clip(self.texture, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr, "RGB").save(png, format="PNG")
            img_off, img_len = add(png.getvalue())
            views.append({"buffer": 0, "byteOffset": img_off,
                          "byteLength": img_len})
            images.append({"bufferView": len(views) - 1,
                           "mimeType": "image/png"})
            samplers.append({"magFilter": 9729, "minFilter": 9729,
                             "wrapS": 10497, "wrapT": 10497})
            textures.append({"sampler": 0, "source": 0})
            material["pbrMetallicRoughness"]["baseColorTexture"] = {
                "index": 0}

        gltf = {
            "asset": {"version": "2.0", "generator": "pointdreamer_tpu"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{
                "attributes": attributes, "indices": 0, "material": 0}]}],
            "materials": [material],
            "bufferViews": views,
            "accessors": accessors,
            "buffers": [{"byteLength": sum(len(b) for b in buffers)}],
        }
        if images:
            gltf["images"] = images
            gltf["textures"] = textures
            gltf["samplers"] = samplers

        js = json.dumps(gltf).encode()
        js += b" " * ((-len(js)) % 4)
        bin_chunk = b"".join(buffers)
        total = 12 + 8 + len(js) + 8 + len(bin_chunk)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(struct.pack("<III", 0x46546C67, 2, total))
            f.write(struct.pack("<II", len(js), 0x4E4F534A))
            f.write(js)
            f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))
            f.write(bin_chunk)
