"""Local interactive chat CLI (reference: psalm/serve/cli.py — image +
streaming loop, no server required)."""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--image-file", default=None)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--max-new-tokens", type=int, default=512)
    args = p.parse_args()

    from psalm_tpu.data.conversation import conv_llava_phi
    from psalm_tpu.data.mappers import ImageMapper
    from psalm_tpu.data.splicer import splice, stack_samples
    from psalm_tpu.data.tokenization import tokenize_special
    from psalm_tpu.models.builder import load_pretrained_model
    from psalm_tpu.models.generation import Generator

    tokenizer, model, variables, context_len = load_pretrained_model(
        args.model_path)
    gen = Generator(model, variables, max_len=context_len)
    mapper = ImageMapper()
    num_image_tokens = (mapper.image_size // 64) ** 2

    image_arr = np.zeros((1, mapper.image_size, mapper.image_size, 3),
                         np.float32)
    if args.image_file:
        from PIL import Image
        proc = mapper.transform_image(
            np.asarray(Image.open(args.image_file).convert("RGB")))
        image_arr = proc.image[None]

    conv = conv_llava_phi.copy()
    first = True
    while True:
        try:
            inp = input("USER: ")
        except EOFError:
            break
        if not inp:
            break
        if first and args.image_file:
            inp = "<image>\n" + inp
            first = False
        conv.append_message(conv.roles[0], inp)
        conv.append_message(conv.roles[1], "")
        prompt = conv.get_prompt()
        input_ids = tokenize_special(prompt, tokenizer)
        s = splice(input_ids, None, num_image_tokens=num_image_tokens,
                   num_seg_queries=1,
                   pad_len=len(input_ids) + num_image_tokens + 8)
        batch = stack_samples([s])
        batch["images"] = image_arr
        toks = gen.generate(batch, max_new_tokens=args.max_new_tokens,
                            temperature=args.temperature,
                            eos_id=getattr(tokenizer, "eos_token_id", None))
        out = tokenizer.decode(toks[0].tolist(), skip_special_tokens=True)
        print("ASSISTANT:", out)
        conv.messages[-1][1] = out


if __name__ == "__main__":
    main()
