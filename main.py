"""Interactive CLI (reference: main.py): numbered model menu → run config.

Usage:
    python main.py              # interactive menu
    python main.py LightGCN     # run ./config/LightGCN.conf directly
    python main.py path/to.conf # run an explicit config file
"""

import os
import sys
import time


MODELS = {
    "Generic Recommenders": {
        "s1": "UserKNN", "s2": "ItemKNN", "s3": "BasicMF", "s4": "SlopeOne",
        "s5": "SVD", "s6": "PMF", "s7": "SVD++", "s8": "EE",
        "s9": "BPR", "s10": "WRMF", "s11": "ExpoMF",
    },
    "Social Recommenders": {
        "a1": "SoRec", "a2": "SoReg", "a3": "SocialMF", "a4": "SBPR",
        "a5": "RSTE", "a6": "TBPR", "a7": "SERec", "a8": "LOCABAL",
        "a9": "SocialFD", "a10": "SREE",
    },
    "Network-Embedding Recommenders": {
        "n1": "CUNE_MF", "n2": "CUNE_BPR", "n3": "IF_BPR",
    },
    "Deep Recommenders": {
        "d1": "APR", "d2": "CDAE", "d3": "DMF", "d4": "NeuMF", "d5": "CFGAN",
        "d6": "IRGAN", "d7": "ESRF", "d8": "RSGAN", "d9": "DiffNet",
        "d10": "DHCF", "d11": "LightGCN", "d12": "NGCF", "d13": "SGL",
        "d14": "MHCN", "d15": "SEPT", "d16": "BUIR", "d17": "SimGCL",
    },
    "Baselines": {
        "b1": "UserMean", "b2": "ItemMean", "b3": "MostPopular", "b4": "Rand",
        "b5": "CoFactor",
    },
}


def menu():
    print("=" * 80)
    print("qrec_tpu: a TPU-native recommender framework (QRec-compatible)")
    print("=" * 80)
    for section, entries in MODELS.items():
        print(f"{section}:")
        for code, name in entries.items():
            print(f"   {code}. {name}", end="")
        print()
    print("=" * 80)
    return input("Please enter the model you want to run: ").strip()


def resolve(choice: str) -> str:
    for entries in MODELS.values():
        if choice in entries:
            return entries[choice]
    return choice


def main():
    from qrec_tpu import ModelConf, QRec

    if len(sys.argv) > 1:
        choice = sys.argv[1]
    else:
        choice = menu()
    if os.path.exists(choice):
        conf_path = choice
    else:
        name = resolve(choice)
        conf_path = os.path.join("./config", name + ".conf")
    s = time.time()
    conf = ModelConf(conf_path)
    QRec(conf).execute()
    print("Running time: %f s" % (time.time() - s))


if __name__ == "__main__":
    main()
