"""Batch generation driver.

Parity target: ``generate_text`` (src/generation.py:6-52): loop over the
loader, call generate with the CLI's beam/sample settings, decode with
skip_special_tokens, and group ``num_gen`` outputs per input row into
``[{index, task_type, generations}]``.
"""

from datetime import datetime

from kmbart_tpu.generation.api import generate


def generate_text(params, cfg, gen_loader, tokenizer, args, *, logger=None,
                  log_interval=1, rng=None):
    total_step = len(gen_loader)
    generated = []
    start_time = datetime.now()
    num_gen = getattr(args, "num_gen", 1)

    from kmbart_tpu.training.trainer import prefetch_to_device
    batches = prefetch_to_device(gen_loader, inputs_only=False)

    for i, batch in enumerate(batches):
        outputs = generate(
            params, cfg,
            {"input_ids": batch["input_ids"],
             "attention_mask": batch.get("attention_mask"),
             "image_features": batch.get("image_features")},
            num_beams=getattr(args, "num_beams", 1),
            num_return_sequences=num_gen,
            do_sample=getattr(args, "do_sample", False),
            top_p=getattr(args, "top_p", 1.0),
            top_k=getattr(args, "top_k", 0),
            max_length=getattr(args, "max_length", None),
            early_stopping=True,
            rng=rng)

        for j in range(len(batch["index"])):
            generations = [
                tokenizer.decode(outputs[j * num_gen + k], skip_special_tokens=True)
                for k in range(num_gen)
            ]
            generated.append({
                "index": batch["index"][j],
                "task_type": batch["task_type"][j],
                "generations": generations,
            })

        if logger is not None and (i + 1) % log_interval == 0:
            eta = (total_step - (i + 1)) / (i + 1) * (datetime.now() - start_time)
            logger.info("Generating, Step [{}/{}], ETA: {}".format(
                i + 1, total_step, str(eta)))

    return generated
