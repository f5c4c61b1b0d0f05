// Shared feature-dump reader for the reference oracle drivers
// (oracle_s4.cpp, oracle_gn2cli.cpp).  Loads the stand-in SMAPSequence
// (src_gn2/gn2lib_seq.h) from the text protocol emitted by
// tests/smap_dump.py.  See oracle_gn2.cpp for the section list; the
// trailing "olc"/"cb"/"hbc" sections are the SSSS extras and the optional
// final "cbd2" section carries squared CB distances for updateCore.
#ifndef ORACLE_SMAP_DUMP_H
#define ORACLE_SMAP_DUMP_H

#include <iostream>
#include <string>
#include <vector>

#include "gn2lib_seq.h"

inline SMAPSequence* read_smap_dump(std::istream& in,
                                    std::string& qprof_path) {
  using std::string;
  using std::vector;
  string tag;
  int n;
  in >> tag >> n >> qprof_path;
  int t2 = n + 2;

  SMAPSequence* templp = new SMAPSequence();
  SMAPSequence& templ = *templp;
  templ.seq_length = n;
  for (int i = 0; i < t2; ++i) templ.push_back(new HMAPElem());
  templ[0]->olc = SequenceElem::Head;
  templ[t2 - 1]->olc = SequenceElem::Tail;
  for (int i = 1; i < t2 - 1; ++i) templ[i]->olc = 'A';

  in >> tag;
  for (int i = 0; i < t2; ++i) in >> templ[i]->lods_type;
  templ.weighted_contact_number.resize(t2);
  in >> tag;
  for (int i = 0; i < t2; ++i) in >> templ.weighted_contact_number[i];
  in >> tag;
  for (int i = 0; i < t2; ++i) in >> templ[i]->sse_values[2];
  in >> tag;
  for (int i = 0; i < t2; ++i) in >> templ[i]->rdata.isse;
  in >> tag;
  for (int i = 0; i < t2; ++i) {
    long st; in >> st;
    templ[i]->rdata.sse_type = (unsigned long)st;
  }
  in >> tag;
  for (int i = 0; i < t2; ++i) in >> templ[i]->rdata.accessibility;
  in >> tag;
  for (int i = 0; i < t2; ++i)
    for (int k = 0; k < 20; ++k) in >> templ[i]->aa_profile[k];
  in >> tag;
  for (int i = 0; i < t2; ++i) in >> templ[i]->hydropathy;
  in >> tag;
  for (int i = 0; i < t2; ++i)
    in >> templ[i]->sse_values[0] >> templ[i]->sse_values[1]
       >> templ[i]->sse_confid;
  in >> tag;  // gap values (4 per position)
  for (int i = 0; i < t2; ++i)
    for (int k = 0; k < 4; ++k) in >> templ[i]->gap_values[k];

  templ.distance.resize(n);
  in >> tag;
  for (int i = 2; i < n + 2; ++i) {
    templ.distance[i - 2].resize(i - 1);
    for (int j = 0; j < i - 1; ++j) in >> templ.distance[i - 2][j];
  }
  templ.distance2.resize(n);
  in >> tag;
  for (int i = 2; i < n + 2; ++i) {
    templ.distance2[i - 2].resize(i - 1);
    for (int j = 0; j < i - 1; ++j) in >> templ.distance2[i - 2][j];
  }
  templ.angle.resize(n);
  in >> tag;
  for (int i = 2; i < n + 2; ++i) {
    templ.angle[i - 2].resize(i - 1);
    for (int j = 0; j < i - 1; ++j) in >> templ.angle[i - 2][j];
  }
  templ.brokenhb.resize(n);
  in >> tag;
  for (int i = 0; i < n; ++i) {
    templ.brokenhb[i].resize(n);
    for (int j = 0; j <= i; ++j) in >> templ.brokenhb[i][j];
  }

  // ---- SSSS extras ----
  string olcs;
  in >> tag >> olcs;
  for (int i = 1; i < t2 - 1 && i < (int)olcs.size() - 1; ++i)
    templ[i]->olc = olcs[i];

  in >> tag;
  for (int i = 0; i < t2; ++i)
    in >> templ[i]->rdata.cb.x >> templ[i]->rdata.cb.y
       >> templ[i]->rdata.cb.z;

  in >> tag;
  templ.hb_contact.resize(n + 1);
  for (int i = 0; i < n + 1; ++i) {
    templ.hb_contact[i].resize(i + 1);
    for (int j = 0; j <= i; ++j) {
      int v; in >> v;
      templ.hb_contact[i][j] = (v != 0);
    }
  }

  // ---- optional squared-CB-distance matrix (updateCore) ----
  if (in >> tag && tag == "cbd2") {
    templ.cb_dist2.resize(n);
    for (int i = 0; i < n; ++i) {
      templ.cb_dist2[i].resize(n);
      for (int j = 0; j < n; ++j) in >> templ.cb_dist2[i][j];
    }
  }
  // ---- optional template sequence name (FASTA/PIR headers) ----
  if (in >> tag && tag == "name") in >> templ.seq_name;
  // ---- optional EVD significance fields ----
  if (in >> tag && tag == "evd")
    in >> templ.evd1_field >> templ.evd2_field;
  return templp;
}

#endif
