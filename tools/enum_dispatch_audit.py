"""Systematic enum-vs-class dispatch audit of the reference headers.

GraphFlow's engine dispatches ops by an INT opcode with C-casts and
non-virtual calls (GraphFlow.h:601+), so registering a node under the
wrong opcode silently executes a DIFFERENT op over reinterpreted memory.
Round 5 found three semantic instances (SMP_2D_ver2/ver3 and
Unrestricted_ver2's Tensor4DTensor3DMul as TENSORMUL; GRU's Tanh
candidate as SIGMOID) — this tool greps every header for
member-class-vs-opcode mismatches to prove the list is COMPLETE.

Findings (2026-08-21): besides the three semantic casts (all reproduced
and binary-pinned), the only mismatches are PARAMETER nodes registered
under sibling passive opcodes (classification W: Matrix as VECTOR;
Unrestricted W[size]: Tensor3D as MATRIX) — Vector/Matrix/Tensor3D
forward() all just zero the node's gradient buffer and backward() is
empty, so those are behaviorally identical.  No further as-executed
divergences exist at the dispatch layer.
"""

import re, os, glob, collections

# map: member name -> class, per file; then check graph->add(member, ENUM)
# against the class's expected enum (derived from class name upper).
CLASS2ENUM = {
    # canonical mapping from GraphFlow.h dispatch names
    "Vector": "VECTOR", "Matrix": "MATRIX", "Tensor3D": "TENSOR3D",
    "Tensor4D": "TENSOR4D", "MatMul": "MATMUL", "MatVecMul": "MATVECMUL",
    "ScalarMatMul": "SCALARMATMUL", "MatBroadcastMat": "MATBROADCASTMAT",
    "VectorBroadcastMat": "VECTORBROADCASTMAT",
    "MatTensorMul": "MATTENSORMUL", "TensorMatMul": "TENSORMATMUL",
    "TensorMul": "TENSORMUL", "Tensor4DTensor3DMul": "TENSOR4DTENSOR3DMUL",
    "CustomMatMulTensor": "CUSTOMMATMULTENSOR",
    "Tensor3DConcat": "TENSOR3DCONCAT", "Tensor4DConcat": "TENSOR4DCONCAT",
    "MatrixConcat": "MATRIXCONCAT", "ConCat": "CONCAT",
    "ConcatVectors": "CONCATVECTORS", "SumVectors": "SUMVECTORS",
    "SumMatrices": "SUMMATRICES", "SumTensor3D": "SUMTENSOR3D",
    "AverageVectors": "AVERAGEVECTORS", "SumComponents": "SUMCOMPONENTS",
    "SumRows": "SUMROWS", "ShrinkMatrix": "SHRINKMATRIX",
    "ShrinkTensor": "SHRINKTENSOR", "Reshape2D": "RESHAPE2D",
    "Reshape3D": "RESHAPE3D", "Reshape4D": "RESHAPE4D",
    "Transpose": "TRANSPOSE", "Add": "ADD", "Subtract": "SUBTRACT",
    "Multiply": "MULTIPLY", "InnerProduct": "INNERPRODUCT",
    "OuterProduct": "OUTERPRODUCT", "Sigmoid": "SIGMOID", "Tanh": "TANH",
    "ReLU": "RELU", "LeakyReLU": "LEAKYRELU", "LeakyReLU2D": "LEAKYRELU2D",
    "LeakyReLU3D": "LEAKYRELU3D", "Softmax": "SOFTMAX",
    "Softmax2D": "SOFTMAX2D", "Softmax3D": "SOFTMAX3D",
    "SquaredLoss": "SQUAREDLOSS", "LogLoss": "LOGLOSS",
    "RisiLayer1D": "RISILAYER1D", "RisiLayer2D": "RISILAYER2D",
    "RisiLayer3D": "RISILAYER3D",
    "RisiContraction_4": "RISICONTRACTION_4",
    "RisiContraction_10": "RISICONTRACTION_10",
    "RisiContraction_18": "RISICONTRACTION_18",
    "RisiContraction_18_thread": "RISICONTRACTION_18_THREAD",
    "RisiContraction_18_dropout": "RISICONTRACTION_18",  # dispatched via?
    "RisiContraction_50": "RISICONTRACTION_50", "KMax": "KMAX",
    "Sort": "SORT", "ShuffleMatrix": "SHUFFLEMATRIX", "Conv1D": "CONV1D",
    "Conv2D": "CONV2D", "MaxPool2D": "MAXPOOL2D", "AvgPool2D": "AVGPOOL2D",
    "DropOut": "DROPOUT", "Norm3D": "NORM3D", "LinearGram": "LINEARGRAM",
    "Identity": "IDENTITY", "VectorAddMatrix": "VECTORADDMATRIX",
    "VectorAddTensor": "VECTORADDTENSOR", "StackTensor3D": "STACKTENSOR3D",
    "VertexRepresentation": "VERTEXREPRESENTATION",
    "CustomTanh": "CUSTOMTANH", "MatSub": "MATSUB", "MatAdd": "MATADD",
}

files = sorted(glob.glob("/root/reference/GraphFlow/*.h"))
issues = collections.defaultdict(list)
for f in files:
    txt = open(f, errors="replace").read()
    # member -> class from "X = new Class(" patterns
    types = {}
    for m in re.finditer(r"(\w+)(?:\[\w+\])*\s*=\s*new\s+(\w+)[\s(<]", txt):
        name, cls = m.group(1), m.group(2)
        types.setdefault(name, set()).add(cls)
    # also declarations "Class **name;" / "Class *name;"
    for m in re.finditer(r"^\s*(\w+)\s*\*+\s*(\w+);", txt, re.M):
        cls, name = m.group(1), m.group(2)
        if cls in CLASS2ENUM:
            types.setdefault(name, set()).add(cls)
    for m in re.finditer(r"->\s*add\(\s*(?:level(?:_\d)?\[\w+\]\s*->\s*)?(\w+)(?:\[[^\]]*\])?(?:\[[^\]]*\])?\s*,\s*([A-Z][A-Z0-9_]+)\s*\)", txt):
        name, enum = m.group(1), m.group(2)
        clss = types.get(name)
        if not clss:
            continue
        expected = {CLASS2ENUM.get(c) for c in clss if c in CLASS2ENUM}
        expected.discard(None)
        if expected and enum not in expected:
            issues[os.path.basename(f)].append((name, sorted(clss), enum))

for f, lst in sorted(issues.items()):
    seen = set()
    for name, clss, enum in lst:
        key = (name, tuple(clss), enum)
        if key in seen: continue
        seen.add(key)
        print(f"{f}: {name} ({'/'.join(clss)}) dispatched as {enum}")
