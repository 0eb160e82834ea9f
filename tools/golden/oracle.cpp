// oracle.cpp — golden-fixture generator for parity testing.
//
// This harness (our code) links against the *reference* PoreSeq C++ core
// mounted read-only at /root/reference/cpp (never copied into this repo) and
// drives it through the same call sequences our engine implements, dumping
// inputs/outputs as flat binary for tests/golden/*.npz fixtures.
//
// Usage: oracle <input.bin> <output.bin>
//
// Input format (little-endian):
//   int32 mode        1=score_events 2=score_muts 3=viterbi 4=swfull
//                     5=mutate_rounds 6=refine_round
//   double lik_offset; int32 scoring_width; int32 realign_width; int32 verbose
//   int32 seq_len; char seq[]
//   int32 n_events; per event:
//     int32 n_levels; double mean[],stdv[],ref_align[],ref_like[]
//     double lev_mean[1024],lev_stdv[1024],sd_mean[1024],sd_stdv[1024]
//     double prob_skip,prob_stay,prob_extend,prob_insert; int32 complement
//     int32 seq2d_len; char seq2d[]
//   mode 2/6: int32 n_muts; per mut: int32 start; int32 olen; char[]; int32 mlen; char[]
//   mode 3:   int32 nkeep; double skip_p, stay_p, mut_min, mut_max
//   mode 4:   int32 len2; char seq2[]
//   mode 5:   int32 reps; int32 n_seqs; per seq: int32 len; char[]

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <string>
#include <vector>

#include "cpp/Mutations.h"
#include "cpp/Alignment.h"
#include "cpp/Viterbi.h"
#include "cpp/swlib.h"
#include "cpp/EventUtil.h"

static FILE* g_in;
static FILE* g_out;

template <typename T>
T rd() {
  T v;
  if (fread(&v, sizeof(T), 1, g_in) != 1) {
    fprintf(stderr, "oracle: short read\n");
    exit(2);
  }
  return v;
}

static std::string rd_str() {
  int32_t n = rd<int32_t>();
  std::string s(n, '\0');
  if (n && fread(&s[0], 1, n, g_in) != (size_t)n) exit(2);
  return s;
}

static std::vector<double> rd_dbl(int n) {
  std::vector<double> v(n);
  if (n && fread(v.data(), sizeof(double), n, g_in) != (size_t)n) exit(2);
  return v;
}

template <typename T>
void wr(T v) {
  fwrite(&v, sizeof(T), 1, g_out);
}
static void wr_dbl(const std::vector<double>& v) {
  fwrite(v.data(), sizeof(double), v.size(), g_out);
}
static void wr_str(const std::string& s) {
  wr<int32_t>((int32_t)s.size());
  fwrite(s.data(), 1, s.size(), g_out);
}

int main(int argc, char** argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: oracle <in.bin> <out.bin>\n");
    return 1;
  }
  g_in = fopen(argv[1], "rb");
  g_out = fopen(argv[2], "wb");
  if (!g_in || !g_out) return 1;

  int32_t mode = rd<int32_t>();

  AlignData data;
  data.params.lik_offset = rd<double>();
  data.params.scoring_width = rd<int32_t>();
  data.params.realign_width = rd<int32_t>();
  data.params.verbose = rd<int32_t>();

  std::string seq = rd_str();
  data.sequence = Sequence(seq);

  int32_t n_events = rd<int32_t>();
  for (int e = 0; e < n_events; e++) {
    int32_t n = rd<int32_t>();
    std::vector<double> mean = rd_dbl(n), stdv = rd_dbl(n), ra = rd_dbl(n),
                        rl = rd_dbl(n);
    std::vector<double> lm = rd_dbl(1024), ls = rd_dbl(1024), sm = rd_dbl(1024),
                        ss = rd_dbl(1024);
    double ps = rd<double>(), pt = rd<double>(), pe = rd<double>(),
           pi = rd<double>();
    int32_t comp = rd<int32_t>();
    std::string s2d = rd_str();
    EventData ev;
    ev.setData(n, mean.data(), stdv.data(), ra.data(), rl.data());
    ev.model.setData(lm.data(), ls.data(), sm.data(), ss.data(), comp != 0);
    ev.model.setParams(ps, pt, pe, pi);
    ev.sequence = Sequence(s2d);
    data.events.push_back(ev);
  }

  if (mode == 1) {
    std::vector<double> likes(seq.size(), 0.0);
    std::vector<double> scores = ScoreAlignments(data, likes.data());
    wr<int32_t>((int32_t)scores.size());
    wr_dbl(scores);
    wr_dbl(likes);
    for (int e = 0; e < n_events; e++) {
      wr_dbl(data.events[e].ref_align);
      wr_dbl(data.events[e].ref_like);
    }
  } else if (mode == 2 || mode == 6) {
    std::vector<MutInfo> muts;
    int32_t nm = rd<int32_t>();
    for (int i = 0; i < nm; i++) {
      MutInfo m;
      m.start = rd<int32_t>();
      m.orig = rd_str();
      m.mut = rd_str();
      muts.push_back(m);
    }
    if (mode == 2) {
      std::vector<MutScore> ms = ScoreMutations(data, muts);
      wr<int32_t>((int32_t)ms.size());
      for (size_t i = 0; i < ms.size(); i++) wr<double>(ms[i].score);
      for (int e = 0; e < n_events; e++) {
        wr_dbl(data.events[e].ref_align);
        wr_dbl(data.events[e].ref_like);
      }
    } else {
      // refine-style: score then greedily apply
      std::vector<MutScore> ms = ScoreMutations(data, muts);
      int nb = MakeMutations(data, ms);
      wr<int32_t>((int32_t)ms.size());
      for (size_t i = 0; i < ms.size(); i++) wr<double>(ms[i].score);
      wr_str(data.sequence.bases);
      wr<int32_t>(nb);
    }
  } else if (mode == 3) {
    int32_t nkeep = rd<int32_t>();
    double skip_p = rd<double>(), stay_p = rd<double>(), mn = rd<double>(),
           mx = rd<double>();
    std::vector<Sequence> seqs =
        ViterbiMutate(data.events, nkeep, skip_p, stay_p, mn, mx, false);
    wr<int32_t>((int32_t)seqs.size());
    for (size_t i = 0; i < seqs.size(); i++) wr_str(seqs[i].bases);
  } else if (mode == 4) {
    std::string seq2 = rd_str();
    SWAlignment al = swfull(seq, seq2);
    wr<double>(al.accuracy);
    wr<int32_t>(al.score);
    wr<int32_t>((int32_t)al.inds1.size());
    fwrite(al.inds1.data(), sizeof(int), al.inds1.size(), g_out);
    fwrite(al.inds2.data(), sizeof(int), al.inds2.size(), g_out);
  } else if (mode == 5) {
    int32_t reps = rd<int32_t>();
    int32_t n_seqs = rd<int32_t>();
    std::vector<Sequence> seqs;
    for (int i = 0; i < n_seqs; i++) seqs.push_back(Sequence(rd_str()));
    int totbases = 0;
    for (int r = 0; r < reps; r++) {
      std::vector<MutInfo> muts = FindMutations(data, seqs);
      std::vector<MutScore> ms = ScoreMutations(data, muts);
      int nb = MakeMutations(data, ms);
      if (nb == 0) break;
      totbases += nb;
    }
    wr_str(data.sequence.bases);
    wr<int32_t>(totbases);
    for (int e = 0; e < n_events; e++) {
      wr_dbl(data.events[e].ref_align);
      wr_dbl(data.events[e].ref_like);
    }
  }

  fclose(g_in);
  fclose(g_out);
  return 0;
}
