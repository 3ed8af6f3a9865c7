"""False-prediction visualizer CLI.

Same surface as /root/reference/false_prediction_vlz.py: read
result.csv (from eval.py), select Target != Prediction rows, render a
3-panel figure (input image, target-class anchor, predicted-class
anchor) per mismatch.
"""

import argparse
import os

from vn_celeb_face_recognition_tpu.utils import read_json


def find_class_anchor(description_dict, class_idx, container):
    from PIL import Image

    images4class = description_dict[str(class_idx)]
    anchor_path = os.path.join(container, images4class[0])
    return Image.open(anchor_path)


def create_image_to_compare(image_input, image_target, image_pred,
                            target_cls, pred_class, prob, input_path, idx,
                            output_container):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3)
    image_name = input_path.split("/")[-1]
    axes[0].imshow(image_input)
    axes[1].imshow(image_target)
    axes[2].imshow(image_pred)
    title = (
        "Input image: {}; ".format(image_name)
        + "Target class index: {}; ".format(target_cls)
        + "Prediction class: {}, probability: {:.2f};".format(
            pred_class, prob
        )
    )
    output_path = os.path.join(
        output_container, "vlz_for_sample_{}.png".format(idx)
    )
    plt.title(title)
    plt.savefig(output_path, bbox_inches="tight")
    plt.close()


def visualize_false_prediction(result_path, description_dict,
                               img_container, output_container):
    import pandas as pd
    from PIL import Image

    if not os.path.exists(output_container):
        os.makedirs(output_container)

    df_result = pd.read_csv(result_path)
    miss_match = df_result["Target"] != df_result["Prediction"]
    rows = df_result.loc[miss_match]
    for idx, (_, row) in enumerate(rows.iterrows()):
        image_input = Image.open(row.iloc[0])
        image_target = find_class_anchor(description_dict, row.iloc[1],
                                         img_container)
        image_pred = find_class_anchor(description_dict, row.iloc[2],
                                       img_container)
        create_image_to_compare(
            image_input, image_target, image_pred, row.iloc[1],
            row.iloc[2], row.iloc[3], row.iloc[0], idx, output_container,
        )
        print(
            "Save visualization for sample at: {}, {}".format(
                idx, row.iloc[0]
            )
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Visualization for false prediction."
    )
    parser.add_argument("-rp", "--result_path", default="result.csv",
                        type=str)
    parser.add_argument("-dcrf", "--description_file",
                        default="vn_celeb.json", type=str)
    parser.add_argument("-icnt", "--image_container", default="train",
                        type=str)
    parser.add_argument("-ocnt", "--output_container",
                        default="output_vlz", type=str)
    args = parser.parse_args()
    desc_dict = read_json(args.description_file)
    visualize_false_prediction(args.result_path, desc_dict,
                               args.image_container,
                               args.output_container)
