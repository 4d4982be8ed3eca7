#!/usr/bin/env perl
# Normalize WSJ transcripts (fresh implementation of the Kaldi wsj
# normalize_transcript.pl contract):
#   normalize_transcript.pl <noise-word> < in > out
# Uppercases, maps verbalized punctuation and noise markers to the noise
# word, strips "*xxx*" emphasis and quoting artifacts.

use strict;
use warnings;

my $noise = shift or die "usage: normalize_transcript.pl <noise-word>\n";

while (<STDIN>) {
    my @out;
    my @words = split;
    my $utt = shift @words;
    foreach my $w (@words) {
        $w = uc($w);
        $w =~ s/\\//g;           # backslashed quotes
        $w =~ s/^\*(.+)\*$/$1/;  # *word* emphasis
        $w =~ s/^~+$// ;
        next if $w eq "~";
        next if $w =~ m/^\[<\S+\]$/ or $w =~ m/^\[\S+>\]$/;  # partial noises
        if ($w =~ m/^\[.*\]$/) { push @out, $noise; next; }  # [noise]
        next if $w eq ".";       # period line marker
        next if $w eq "";
        $w =~ s/^%PERCENT$/PERCENT/;
        $w =~ s/^\.POINT$/POINT/;
        push @out, $w;
    }
    print "$utt @out\n";
}
