"""glTF parser tests on synthetic documents (assets are not in-tree —
SURVEY §6 — so fixtures are constructed in-test, matching the schema the
reference's gltf.c consumes)."""
import base64
import json
import struct

import numpy as np
import jax.numpy as jnp

from clap_tpu.scene.gltf import load_gltf, build_rig, find_collision_mesh
from clap_tpu.anim.clips import sample_pose
from clap_tpu.anim.joints import joint_matrices


def _b64(arr):
    return "data:application/octet-stream;base64," + base64.b64encode(
        arr.tobytes()).decode()


def make_skinned_gltf():
    """2-joint arm: 4 verts, one animation rotating joint 1."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    joints = np.array([[0, 0, 0, 0]] * 2 + [[1, 0, 0, 0]] * 2, np.uint16)
    weights = np.array([[1, 0, 0, 0]] * 4, np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    invbind = np.stack([np.eye(4, dtype=np.float32)] * 2)
    # glTF stores matrices column-major
    invbind_flat = invbind.transpose(0, 2, 1).reshape(2, 16)
    times = np.array([0.0, 1.0], np.float32)
    rots = np.array([[0, 0, 0, 1], [0, 0, 0.7071, 0.7071]], np.float32)

    def buf_entry(arr):
        return {"uri": _b64(arr), "byteLength": arr.nbytes}

    buffers = [verts, normals, joints, weights, idx, invbind_flat, times, rots]
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [buf_entry(a) for a in buffers],
        "bufferViews": [
            {"buffer": i, "byteOffset": 0, "byteLength": a.nbytes}
            for i, a in enumerate(buffers)
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 4, "type": "VEC4"},
            {"bufferView": 3, "componentType": 5126, "count": 4, "type": "VEC4"},
            {"bufferView": 4, "componentType": 5123, "count": 6, "type": "SCALAR"},
            {"bufferView": 5, "componentType": 5126, "count": 2, "type": "MAT4"},
            {"bufferView": 6, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 7, "componentType": 5126, "count": 2, "type": "VEC4"},
        ],
        "meshes": [{
            "name": "arm",
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "JOINTS_0": 2,
                               "WEIGHTS_0": 3},
                "indices": 4,
                "material": 0,
            }],
        }],
        "materials": [{
            "name": "skin",
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.6, 0.5, 1.0],
                "metallicFactor": 0.1, "roughnessFactor": 0.7,
            },
            "emissiveFactor": [0.0, 0.1, 0.0],
        }],
        "skins": [{"joints": [0, 1], "inverseBindMatrices": 5}],
        "animations": [{
            "name": "wave",
            "samplers": [{"input": 6, "output": 7,
                          "interpolation": "LINEAR"}],
            "channels": [{"sampler": 0,
                          "target": {"node": 1, "path": "rotation"}}],
        }],
        "nodes": [
            {"name": "root", "children": [1],
             "translation": [0, 0, 0]},
            {"name": "elbow", "translation": [0, 1, 0]},
        ],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    return json.dumps(doc)


def test_parse_meshes_and_materials():
    doc = load_gltf(make_skinned_gltf())
    assert len(doc.meshes) == 1
    m = doc.meshes[0]
    assert m.verts.shape == (4, 3)
    assert m.indices.tolist() == [0, 1, 2, 0, 2, 3]
    assert m.joints is not None and m.weights is not None
    mat = doc.materials[0]
    assert abs(mat.roughness - 0.7) < 1e-6
    assert mat.base_color[0] == 0.8


def test_build_rig_and_animate():
    doc = load_gltf(make_skinned_gltf())
    sk, lib, names, remap = build_rig(doc)
    assert names == ["wave"]
    assert sk.parent.tolist() == [-1, 0]
    # base pose: joint 1 offset (0,1,0)
    np.testing.assert_allclose(np.asarray(sk.base.trans[1]), [0, 1, 0],
                               atol=1e-6)
    # sample the animation at t=1: joint 1 rotated 90° about z
    pose = sample_pose(lib, sk.base, jnp.int32(0), jnp.float32(1.0))
    jt = joint_matrices(sk, pose)
    # vertex bound to joint 1 at (1,1,0): invbind=I so
    # JT = global(1) = T(0,1,0)·R90z: p' = T·R·p = (−1+0, 1+1, 0)
    p = np.asarray(jt[1] @ np.array([1, 1, 0, 1.0]))
    np.testing.assert_allclose(p[:3], [-1, 2, 0], atol=1e-4)


def test_glb_roundtrip():
    js = make_skinned_gltf().encode()
    pad = (4 - len(js) % 4) % 4
    js = js + b" " * pad
    glb = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js)) \
        + struct.pack("<II", len(js), 0x4E4F534A) + js
    doc = load_gltf(glb)
    assert len(doc.meshes) == 1


def test_collision_mesh_convention():
    raw = json.loads(make_skinned_gltf())
    # add a "collision" mesh reusing accessors
    raw["meshes"].append({
        "name": "collision",
        "primitives": [{"attributes": {"POSITION": 0}, "indices": 4}],
    })
    doc = load_gltf(json.dumps(raw))
    render, coll = find_collision_mesh(doc)
    assert render.name == "arm"
    assert coll is not None and coll.name == "collision"
