"""Generate the committed evaluation corpus (tests/data/tiny_corpus.txt).

The sandbox has no network, so WikiText-2 is unreachable; the perplexity
chain (scripts/ppl_chain.py) instead trains and scores on this deterministic
synthetic-English corpus: a hand-written base text plus template-generated
sentence variations (seeded), giving a stream with learnable structure and
enough lexical diversity that next-token NLL is neither trivial nor flat.
The corpus file is COMMITTED — regenerating with this script is bit-exact.
"""
import os
import random

BASE = """
A tensor library stores numbers in rectangular blocks and moves them through
a fixed set of operations. The graph records which operation produced each
value, so the gradient of a loss can be traced backward through every node.
When the weights of a network are quantized, each block of thirty two values
is replaced by a scale and a handful of small integers. The scale is chosen
so that the largest value in the block survives the rounding. A good
quantizer keeps the perplexity of the model close to the perplexity of the
original weights, and the difference between the two is the quantity worth
measuring. The processor multiplies matrices in a systolic array, and the
memory system feeds the array through a wide bus. When the batch is small
the bus is the bottleneck, and the time for a step is the number of bytes
touched divided by the bandwidth. A careful kernel reads each weight once,
unpacks it near the register file, and accumulates the products in high
precision. The optimizer adjusts the weights by the gradient, scaled by a
learning rate, with a running average of the first and second moments. A
line search tries several step sizes along a direction and accepts the
first one that reduces the loss enough. The scheduler assigns work to the
cores, and a barrier holds them together between phases. The cache holds
the keys and the values of every past token, so the attention of a new
token costs a read over the prefix instead of a fresh pass over the text.
"""

NOUNS = ["kernel", "tensor", "block", "scale", "graph", "gradient", "model",
         "weight", "token", "cache", "buffer", "thread", "batch", "matrix",
         "vector", "layer", "head", "prefix", "stream", "register", "loop",
         "array", "bus", "core", "step", "loss", "value", "node", "table"]
VERBS = ["reads", "writes", "scales", "stores", "moves", "splits", "packs",
         "unpacks", "feeds", "holds", "traces", "rounds", "clips", "sums",
         "masks", "loads", "merges", "updates", "shifts", "keeps"]
ADJS = ["small", "large", "dense", "sparse", "fast", "slow", "wide",
        "narrow", "packed", "quantized", "rounded", "shared", "fused",
        "cached", "stable", "exact", "careful", "simple"]
TAILS = ["in one pass", "per block", "once per step", "for every row",
         "without a copy", "near the register file", "over the prefix",
         "under the mask", "at high precision", "before the barrier",
         "after the reduction", "inside the inner loop"]


def make_text(n_sent: int = 260, seed: int = 20260819) -> str:
    """Deterministic synthetic-English stream: the hand-written base text
    plus n_sent template sentences (the committed tiny corpus is
    make_text(260); scripts/ppl_chain.py uses a much larger draw so its
    held-out half scores >=20k tokens)."""
    rng = random.Random(seed)
    parts = [BASE.strip().replace("\n", " ")]
    for _ in range(n_sent):
        s = (f"The {rng.choice(ADJS)} {rng.choice(NOUNS)} "
             f"{rng.choice(VERBS)} the {rng.choice(ADJS)} "
             f"{rng.choice(NOUNS)} {rng.choice(TAILS)}.")
        parts.append(s)
        if rng.random() < 0.25:
            parts.append(rng.choice(BASE.strip().split(". "))
                         .strip().rstrip(".") + ".")
    return " ".join(parts)


def main():
    text = make_text()
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                       "tiny_corpus.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(text + "\n")
    print(f"wrote {out} ({len(text)} chars)")


if __name__ == "__main__":
    main()
