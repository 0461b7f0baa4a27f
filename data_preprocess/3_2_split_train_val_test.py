"""Split clips into train/val with an idle gap
(reference data_preprocess/3_2_split_train_val_test.py).

80/20 per-video split; 13 clips between train and val are marked 'idle' so the two
sets share no frames (stride 5, 64-frame windows: 13*5 > 64).
"""

import argparse
import os

import pandas as pd

parser = argparse.ArgumentParser(description="split train and validation set")
parser.add_argument("-b", "--base_dataset_path", type=str, required=True)
parser.add_argument("-s", "--speaker", type=str, required=True)
args = parser.parse_args()

DATASET_PATH = os.path.join(args.base_dataset_path, args.speaker)
TMPCSV_PATH = os.path.join(DATASET_PATH, "tmp", "intermediate_csv")

if __name__ == "__main__":
    train_test_ratio = 0.8
    idle_num = 13

    csvs = sorted(os.path.join(TMPCSV_PATH, f) for f in os.listdir(TMPCSV_PATH)
                  if f.startswith("tmp"))
    train_dfs, idle_dfs, test_dfs = [], [], []
    for csv_path in csvs:
        df = pd.read_csv(csv_path)
        n = len(df)
        split = int(n * train_test_ratio)
        train_dfs.append(df.iloc[:split])

        idle_df = df.iloc[split: split + idle_num].copy()
        idle_df.loc[:, "dataset"] = "idle"
        idle_dfs.append(idle_df)

        test_df = df.iloc[split + idle_num:].copy()
        test_df.loc[:, "dataset"] = "dev"
        test_dfs.append(test_df)

        print(f"file: {os.path.basename(csv_path)}, total: {n}, "
              f"train: {split}, test: {n - split}")

    out = pd.concat([pd.concat(train_dfs), pd.concat(idle_dfs),
                     pd.concat(test_dfs)])
    out.to_csv(os.path.join(DATASET_PATH, "clips.csv"), index=False)
    # the runtime dataset reads processed_137.csv (gesture_dataset.py); keep both names
    out.to_csv(os.path.join(DATASET_PATH, "processed_137.csv"), index=False)
