"""Evolutionary search over language-model decoding weights.

Capability parity with the reference search command (reference:
speecht/parameter_search.py:28-151): ``Candidate`` holding
(lm_weight, word_count_weight, valid_word_count_weight) with score
``-(global LER + global WER)``, Gaussian mutation with ``--noise-std``,
a population kept sorted and capped at ``--population-size``, seeded with
Candidate(1.0, 0.0, 0.0), optional curses UI.

Because decoding weights are runtime arguments of the host beam search (not
compiled constants), each candidate evaluation re-decodes *the same device
emissions* with new weights — the expensive TPU forward runs once per batch
of dev data, then every mutation only re-runs the cheap host beam. This is
strictly faster than the reference, which re-runs the full graph per
candidate (parameter_search.py:80-85).
"""

from __future__ import annotations

import bisect
import random

import numpy as np

from speecht_tpu.evaluation import Evaluation
from speecht_tpu.metrics import EvalStatistics
from speecht_tpu.ops.beam import BeamSearchDecoder
from speecht_tpu.execution import init_state
from speecht_tpu.parallel import mesh as pmesh


class Candidate:
    def __init__(self, lm_weight: float, word_count_weight: float,
                 valid_word_count_weight: float):
        self.score = None
        self.stats: EvalStatistics | None = None
        self.lm_weight = lm_weight
        self.word_count_weight = word_count_weight
        self.valid_word_count_weight = valid_word_count_weight

    def __gt__(self, other):
        return self.score > other.score

    def __lt__(self, other):
        return self.score < other.score

    def __str__(self):
        return (
            "{:.2f} Candidate (lm_weight={:.2f}, wc_weight={:.2f}, "
            "valid_wc_weight={:.2f}) has LER: {:.2f} WER: {:.2f}"
        ).format(
            self.score,
            self.lm_weight,
            self.word_count_weight,
            self.valid_word_count_weight,
            self.stats.global_letter_error_rate,
            self.stats.global_word_error_rate,
        )

    def update_score(self, score: float, stats: EvalStatistics):
        self.score = score
        self.stats = stats

    @staticmethod
    def random_noise(std: float) -> float:
        return float(np.random.normal(loc=0, scale=std))

    def mutate(self, std: float) -> "Candidate":
        return Candidate(
            lm_weight=self.lm_weight + self.random_noise(std),
            word_count_weight=self.word_count_weight + self.random_noise(std),
            valid_word_count_weight=(
                self.valid_word_count_weight + self.random_noise(std)
            ),
        )


class LanguageModelParameterSearch(Evaluation):
    """Local search over the three decode weights on the dev set."""

    def __init__(self, flags):
        import jax

        if jax.process_count() > 1:
            # the search is host-driven state (unseeded mutations, a
            # population each process would evolve differently) and its
            # emission cache reads device arrays back per candidate —
            # running it distributed would silently score candidates on
            # divergent data. Launch it single-process.
            raise ValueError(
                "search runs single-process; launch it without the "
                "distributed environment (JAX_COORDINATOR_ADDRESS etc.)"
            )
        super().__init__(flags)
        self.candidates: list[Candidate] = []
        self.num_iterations = 0

    def dataset_name(self) -> str:
        return "dev"

    def create_sample_generator(self, limit_count: int):
        return self.reader.load_samples(
            "dev",
            loop_infinitely=False,
            limit_count=limit_count,
            feature_type=self.flags.feature_type,
        )

    def get_loader_limit_count(self) -> int:
        return getattr(self.flags, "step_count", 1) * self.flags.batch_size

    def get_max_steps(self):
        return getattr(self.flags, "step_count", 1) or 1

    def _collect_emissions(self, state, beam: BeamSearchDecoder):
        """Run the device forward once over the dev subset; cache emissions.

        With ``--device-beam`` the emissions stay device-resident so each
        candidate re-runs only the on-chip beam (no tunnel round trips)."""
        cached = []
        with pmesh.use_mesh(self.mesh):
            for batch in self.create_loader():
                _loss, logp, lengths = beam._device_part(state.params, batch)
                cached.append(
                    (
                        logp if beam.device_beam else np.asarray(logp),
                        np.asarray(lengths),
                        np.asarray(batch.labels),
                        np.asarray(batch.label_lengths),
                        np.asarray(batch.seq_lengths),
                    )
                )
        return cached

    def _score_candidate(self, beam, cached, candidate: Candidate):
        from speecht_tpu import vocabulary

        stats = EvalStatistics()
        for logp, lengths, labels, label_lengths, seq_lengths in cached:
            decoded, dec_lengths = beam.decode_emissions(
                logp,
                lengths,
                lm_weight=candidate.lm_weight,
                word_count_weight=candidate.word_count_weight,
                valid_word_count_weight=candidate.valid_word_count_weight,
            )
            for i in range(decoded.shape[0]):
                if seq_lengths[i] == 0:
                    continue
                expected = vocabulary.ids_to_sentence(
                    labels[i, : label_lengths[i]]
                )
                got = vocabulary.ids_to_sentence(decoded[i, : dec_lengths[i]])
                stats.track_decoding(got, expected)
        score = -(stats.global_letter_error_rate + stats.global_word_error_rate)
        candidate.update_score(score, stats)

    def run(self, max_iterations: int | None = None):
        flags = self.flags
        if max_iterations is None:
            # CLI surface: `search --generations N` bounds the run
            # (0 keeps the reference's run-until-interrupted behavior)
            max_iterations = getattr(flags, "generations", 0) or None
        state, _tx = init_state(self.model, flags)
        ckpt = self.checkpoint_manager()
        state = ckpt.restore(state)

        beam = BeamSearchDecoder(self.model, flags.lm)
        print("Collecting device emissions over the dev subset")
        cached = self._collect_emissions(state, beam)

        def run_search(stdscr=None):
            new_candidate = Candidate(1.0, 0.0, 0.0)
            self._score_candidate(beam, cached, new_candidate)
            self.candidates.append(new_candidate)
            self._report(stdscr, new_candidate)

            while (
                max_iterations is None
                or self.num_iterations < max_iterations
            ):
                random_candidate = random.choice(self.candidates)
                new_candidate = random_candidate.mutate(flags.noise_std)
                self._score_candidate(beam, cached, new_candidate)
                bisect.insort(self.candidates, new_candidate)
                if len(self.candidates) > flags.population_size:
                    del self.candidates[0]
                self.num_iterations += 1
                self._report(stdscr, new_candidate)

        if getattr(flags, "use_ui", False):
            from curses import wrapper

            wrapper(run_search)
        else:
            run_search()
        ckpt.close()
        return self.candidates

    def _report(self, stdscr, candidate):
        if stdscr is not None:
            stdscr.clear()
            stdscr.addstr(
                0, 0,
                f"Current population after {self.num_iterations} iterations",
            )
            for idx, cand in enumerate(reversed(self.candidates)):
                stdscr.addstr(idx + 2, 0, str(cand))
            stdscr.refresh()
        else:
            print(candidate)
            # 4-decimal twin for scripted consumers (the reference-parity
            # line above rounds to 2 decimals, which cannot resolve
            # improvements near an error floor)
            print(
                "candidate-precise: score {:.4f} lm_weight {:.4f} "
                "wc_weight {:.4f} valid_wc_weight {:.4f} "
                "LER {:.4f} WER {:.4f}".format(
                    candidate.score,
                    candidate.lm_weight,
                    candidate.word_count_weight,
                    candidate.valid_word_count_weight,
                    candidate.stats.global_letter_error_rate,
                    candidate.stats.global_word_error_rate,
                )
            )
