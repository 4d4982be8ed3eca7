#!/usr/bin/env perl
# Extract transcripts for the utterances in an id list from WSJ .dot
# files (fresh implementation of the Kaldi wsj find_transcripts.pl
# contract):
#   find_transcripts.pl dot_files.flist < utt_ids > transcripts
# .dot lines look like: "some transcript words (utt0id)".
#
# Dot files are indexed by basename prefix and parsed LAZILY: only the
# files that can contain a requested utterance are read (WSJ utterance
# ids share their first six characters — speaker + session — with their
# dot file's name), so repeated invocations over the same corpus-wide
# flist stay proportional to the requested set, not the corpus.

use strict;
use warnings;

my $dot_flist = shift or die "usage: find_transcripts.pl dot-flist\n";
open(my $fh, "<", $dot_flist) or die "cannot open $dot_flist\n";
my %dots_of_prefix;   # first-6-chars of basename -> [paths]
my @unkeyed;          # short/odd names: parsed only as a last resort
while (my $dot = <$fh>) {
    chomp $dot;
    (my $base = $dot) =~ s|.*/||;
    $base =~ s/\.[^.]*$//;
    if (length($base) >= 6) {
        push @{$dots_of_prefix{lc(substr($base, 0, 6))}}, $dot;
    } else {
        push @unkeyed, $dot;
    }
}
close $fh;

my %utt2trans;
my %parsed;

sub parse_dot {
    my ($dot) = @_;
    return if $parsed{$dot}++;
    open(my $dfh, "<", $dot) or die "cannot open $dot\n";
    while (<$dfh>) {
        chomp;
        next unless m/^(.*)\((\S+)\)\s*$/;
        my ($trans, $utt) = ($1, lc($2));
        $trans =~ s/^\s+|\s+$//g;
        $utt2trans{$utt} = $trans;
    }
    close $dfh;
}

while (<STDIN>) {
    chomp;
    my $utt = lc($_);
    if (not exists $utt2trans{$utt}) {
        my $prefix = length($utt) >= 6 ? substr($utt, 0, 6) : $utt;
        parse_dot($_) for @{$dots_of_prefix{$prefix} || []};
    }
    if (not exists $utt2trans{$utt}) {
        parse_dot($_) for @unkeyed;    # fallback: odd file naming
    }
    if (exists $utt2trans{$utt}) {
        print "$utt $utt2trans{$utt}\n";
    } else {
        print STDERR "find_transcripts.pl: no transcript for $utt\n";
    }
}
